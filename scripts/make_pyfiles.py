"""Package reiz_io_spark for `spark-submit --py-files` (north rule:
the build "runs via spark-submit --py-files on multi-executor
clusters"). Produces dist/reiz_io_spark.zip containing the package
only — pure-Python, no compiled artifacts, so one zip serves every
executor platform.

Usage: python scripts/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    pkg = os.path.join(REPO, "reiz_io_spark")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "reiz_io_spark.zip"
    )
    print(build_zip(out))
