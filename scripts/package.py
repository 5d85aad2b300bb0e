#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

Produces dist/torchtrajectory_spark.zip containing the package tree —
the artifact every executor needs on a multi-executor cluster
(BASELINE.json north rule: "run via spark-submit --py-files").
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "torchtrajectory_spark"


def build(out_path: str | None = None) -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out_path = out_path or os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
