#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

The north rule runs the pipeline via ``spark-submit --py-files`` on a
multi-executor cluster; this packages the ``rio_spark`` package (sources
only, no tests) into a zip importable on every executor:

    python jobs/package_pyfiles.py              # -> dist/rio_spark.zip
    spark-submit --py-files dist/rio_spark.zip \\
        jobs/run_pipeline.py --transcripts <iceberg-table> --store <graph-table>

Local mode never needs this (the repo root is on sys.path); it exists so the
exact same job script submits unchanged to a real cluster.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "rio_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "rio_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    names = zipfile.ZipFile(path).namelist()
    print(f"{path} ({len(names)} modules)")
