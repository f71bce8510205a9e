#!/usr/bin/env python
"""Zip the openccnet_spark package (including the dictionary bundle) for
``spark-submit --py-files``. Deterministic output (sorted entries, zeroed
timestamps)."""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build(out: Path) -> Path:
    pkg = ROOT / "openccnet_spark"
    files = sorted(
        p for p in pkg.rglob("*")
        if p.is_file() and "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)), date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "openccnet_spark.zip"))
    a = ap.parse_args()
    print(build(Path(a.out)))
