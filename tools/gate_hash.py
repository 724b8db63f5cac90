#!/usr/bin/env python3
"""Builder-source hashing for the driver-gate re-entry policy.

VERDICT.md round 3, item 1: *any query whose builder diffs since its
last driver-green round re-enters the gate next round*. The pin is a
per-query content hash over

  - the builder function's own source (inspect.getsource),
  - its oracle SQL string,
  - the FULL SOURCE of every cvemate_spark module the builder's module
    (or the builder body, via function-local imports) transitively
    imports — deliberately coarse: an edit to operators/dedup.py flags
    every dedup query, which is exactly the conservatism the policy
    wants (the round-3 q06 incident was an operator-layer rewrite that
    never touched the query module).

Hashes live in tests/gate_hashes.json as {"round": N, "hashes":
{name: sha256}}. tests/test_registry.py fails when a recorded hash
changed for a query that is NOT in DRIVER_GATE; the remedy is to
rotate the query in, or — for provably-untouched semantics — refresh
via tools/update_gate_hashes.py, which re-runs the local oracle on
every changed query before accepting the new hash.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "cvemate_spark"
HASH_FILE = REPO / "tests" / "gate_hashes.json"

# `import\s+\(?` — PARENTHESIZED multi-line imports must match too:
# `from ..operators.merge_versioned import (\n    alter..., \n)` was
# invisible to the old `[\w ,]+` names group (it cannot match "("),
# so 28 query-module imports of the versioned layer never entered any
# closure and the re-entry tripwire was blind to merge_versioned edits
# (round-11 find, same class as the round-6 jobs.py blind spot). The
# names group may be empty for the multi-line form — the BASE module
# is what the closure needs; continuation-line names are symbols (no
# `from pkg import (submodule, ...)` exists in the tree, asserted in
# tests/test_registry.py).
_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.+)([\w.]*)\s+import\s+\(?\s*([\w ,]*)"
    r"|^\s*from\s+(cvemate_spark[\w.]*)\s+import\s+\(?\s*([\w ,]*)",
    re.MULTILINE,
)


def _module_path(dotted: str) -> Path | None:
    """cvemate_spark.operators.dedup -> file path (module or package)."""
    rel = dotted.split(".")[1:]  # drop leading 'cvemate_spark'
    base = PKG.joinpath(*rel) if rel else PKG
    if base.with_suffix(".py").is_file():
        return base.with_suffix(".py")
    if (base / "__init__.py").is_file():
        return base / "__init__.py"
    return None


def _resolve(current_mod: str, dots: str, tail: str) -> str | None:
    """Resolve a relative import found in module `current_mod`."""
    parts = current_mod.split(".")
    # package of the current module (modules live in packages)
    pkg_parts = parts[:-1]
    up = len(dots) - 1
    if up > len(pkg_parts):
        return None
    base = pkg_parts[: len(pkg_parts) - up] if up else pkg_parts
    dotted = ".".join(base + ([tail] if tail else []))
    return dotted if dotted.startswith("cvemate_spark") else None


def _imports_of(dotted: str, extra_src: str = "") -> set[str]:
    """cvemate_spark modules imported by `dotted` (file scan), plus any
    found in `extra_src` (e.g. a builder body's function-local imports,
    resolved relative to the same module)."""
    path = _module_path(dotted)
    out: set[str] = set()
    srcs = []
    if path is not None:
        srcs.append(path.read_text())
    if extra_src:
        srcs.append(extra_src)
    for src in srcs:
        for m in _IMPORT_RE.finditer(src):
            if m.group(4):  # absolute cvemate_spark import
                base, names = m.group(4), m.group(5)
            else:
                base = _resolve(dotted, m.group(1), m.group(2))
                names = m.group(3)
            if not base:
                continue
            out.add(base)
            # `from pkg import submodule` names a MODULE, not a symbol:
            # include it, or an edit to pkg/submodule.py is invisible
            # behind an empty package __init__ (the round-6 jobs.py
            # blind spot — `from ..streaming import jobs` hashed only
            # streaming/__init__.py)
            for n in (names or "").split(","):
                cand = f"{base}.{n.strip()}"
                if n.strip() and _module_path(cand) is not None:
                    out.add(cand)
    return out


def _closure(seed: str, extra_src: str = "") -> list[str]:
    """Transitive cvemate_spark import closure, deterministic order."""
    seen: set[str] = set()
    todo = sorted(_imports_of(seed, extra_src) | {seed})
    while todo:
        mod = todo.pop()
        if mod in seen:
            continue
        seen.add(mod)
        for dep in _imports_of(mod):
            if dep not in seen:
                todo.append(dep)
    return sorted(seen)


def builder_hash(spec) -> str:
    """Content hash of a QuerySpec's builder + oracle + dep closure."""
    try:
        src = inspect.getsource(spec.builder)
    except (OSError, TypeError):
        src = repr(spec.builder)
    mod = getattr(spec.builder, "__module__", "cvemate_spark.queries")
    h = hashlib.sha256()
    h.update(src.encode())
    h.update(b"\0")
    h.update((spec.oracle or "").encode())
    for dep in _closure(mod, extra_src=src):
        p = _module_path(dep)
        if p is not None:
            h.update(b"\0")
            h.update(dep.encode())
            h.update(b"\0")
            h.update(p.read_bytes())
    return h.hexdigest()


def current_hashes() -> dict[str, str]:
    sys.path.insert(0, str(REPO))
    from cvemate_spark.queries import REGISTRY

    return {name: builder_hash(spec) for name, spec in sorted(REGISTRY.specs.items())}


def recorded() -> dict:
    if HASH_FILE.is_file():
        return json.loads(HASH_FILE.read_text())
    return {"round": 0, "hashes": {}}


if __name__ == "__main__":
    cur = current_hashes()
    rec = recorded().get("hashes", {})
    changed = [n for n in cur if n in rec and rec[n] != cur[n]]
    new = [n for n in cur if n not in rec]
    print(json.dumps({"changed": changed, "new": new}, indent=2))
