"""SRC-10: decompression/unarchive on ingest (handlers/utils.py:97-122).

gzip is transparent to every Spark file reader; zip is not a Hadoop
codec, so zips are exploded into a landing directory before the scan —
same division of labor as the reference (download+unzip happens before
any parsing there too).
"""

from __future__ import annotations

import gzip
import os
import shutil
import zipfile


def gunzip_file(src: str, dst: str) -> str:
    """utils.py:100-103 equivalent (rarely needed: Spark readers handle
    .gz natively; kept for ingestion symmetry)."""
    with gzip.open(src, "rb") as fin, open(dst, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    return dst


def unzip_to_landing(src: str, landing_dir: str, pattern: str = ".json") -> list[str]:
    """utils.py:105-122 equivalent: explode a zip into a landing dir for
    `spark.read` (SRC-3). Returns extracted paths."""
    os.makedirs(landing_dir, exist_ok=True)
    out = []
    with zipfile.ZipFile(src) as zf:
        for name in zf.namelist():
            base = os.path.basename(name)
            if not base or (pattern and not base.endswith(pattern)):
                continue
            dst = os.path.join(landing_dir, base)
            with zf.open(name) as fin, open(dst, "wb") as fout:
                shutil.copyfileobj(fin, fout)
            out.append(dst)
    return out
