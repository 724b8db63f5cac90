"""Pure-Python protobuf runtime bridge (a PATH bridge, not vendored code).

This container has no `protobuf` pip package, but PySpark 4's
``transformWithStateInPandas`` Python state server needs one: its
generated ``pyspark/sql/streaming/proto/StateMessage_pb2.py`` imports
``google.protobuf.*`` (lazily, per call site). A pure-Python protobuf
runtime 6.32.0 ships inside this machine's google-cloud-sdk
(``platform/google_appengine/google/protobuf``); this package bridges
``google.*`` imports onto it instead of vendoring ~20k lines of
BSD-licensed runtime into the repo.

Placement: the repo ROOT, because every process that needs it already
has the repo root on ``sys.path`` — the driver via
``__spark_entry__``'s ``sys.path.insert``, pytest via rootdir, and
(critically) Spark's Python workers via the daemon's cwd, which in
local mode is the JVM's cwd. No env var or session conf has to
propagate anything.

Two jobs:

1. extend this namespace's ``__path__`` with the SDK's ``google/``
   dir, so ``google.protobuf`` resolves to the bundled 6.32.0
   pure-Python runtime (``api_implementation.Type() == 'python'``);
2. soften the gencode-vs-runtime version gate for the ONE case this
   repo proves safe: same domain, same major, runtime AT MOST ONE
   minor older than gencode. PySpark 4.1.2's StateMessage gencode is
   protoc 6.33; the bundled runtime is 6.32; the proto is plain
   proto3 (``syntax="proto3"``, no editions) whose serialized
   descriptor and wire format round-trip exactly on 6.32 — law-tested
   in tests/test_streaming.py, end-to-end proven by the s10_tws gate.
   Any other mismatch (different major/domain) still raises.

If the SDK runtime is absent (other machines), this package is inert:
``google.protobuf`` fails to import exactly as before, and the TWS
operator raises its NotImplementedError environment boundary
(cvemate_spark/streaming/jobs.py). Installing a real `protobuf`
package also wins automatically: every ``google/`` namespace dir found
on sys.path is grafted onto THIS package's ``__path__`` ahead of the
SDK bridge, and when a real ``google/protobuf`` is present the
version-gate softening disengages entirely — the genuine runtime keeps
its own gate. Delete this directory once a real runtime exists.
"""

import os
import sys

# First: extend with any REAL google namespace dirs on sys.path
# (site-packages installs). Because this repo-root package shadows the
# whole google.* namespace for every process with the repo root on
# sys.path, a genuine `protobuf` / google-cloud install would silently
# break unless its dirs are reachable through THIS package's __path__.
# Real installs are listed BEFORE the SDK bridge so they win.
_here = os.path.dirname(os.path.abspath(__file__))
for _p in list(sys.path):
    _g = os.path.join(_p or ".", "google")
    if (
        os.path.isdir(_g)
        and os.path.abspath(_g) != _here
        and _g not in __path__
    ):
        __path__.append(_g)

_CANDIDATES = (
    os.environ.get("CVEMATE_PB_RUNTIME"),
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
)
_sdk = None
for _c in _CANDIDATES:
    if _c and os.path.isdir(os.path.join(_c, "protobuf")):
        _sdk = _c
        __path__.append(_c)
        break

# Only soften the version gate when the bridge (not a real install)
# supplied the runtime: if a site-packages google/protobuf exists, the
# genuine runtime owns its own gate untouched.
_real_install = any(
    os.path.isdir(os.path.join(_g, "protobuf"))
    for _g in __path__
    if os.path.abspath(_g) != _here and _g != _sdk
)
if _real_install:
    _sdk = None

if _sdk is not None:
    try:
        import warnings as _warnings

        from google.protobuf import runtime_version as _rv

        _orig_validate = _rv.ValidateProtobufRuntimeVersion

        def _permissive_validate(domain, major, minor, patch, suffix, location):
            try:
                _orig_validate(domain, major, minor, patch, suffix, location)
            except _rv.VersionError:
                if domain != _rv.DOMAIN or major != _rv.MAJOR:
                    raise  # cross-major/domain: no compatibility claim
                if minor - _rv.MINOR > 1:
                    raise  # bridge claims exactly one-minor skew (6.33
                    # gencode on 6.32 runtime), not arbitrary gaps
                _warnings.warn(
                    f"protobuf gencode {major}.{minor}.{patch} running on "
                    f"older runtime {_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH} for "
                    f"{location}: allowed by the repo's bridge (same major; "
                    "proto3 round-trip law-tested), not guaranteed upstream"
                )

        _rv.ValidateProtobufRuntimeVersion = _permissive_validate
    except ImportError:
        # runtime too old to even have runtime_version: leave untouched;
        # gencode that requires the gate will fail loudly on its own
        pass
