"""Package deduplicate_spark for spark-submit --py-files.

    python jobs/build_zip.py   ->  dist/deduplicate_spark.zip
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "deduplicate_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "deduplicate_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fname in sorted(files):
                if fname.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fname)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
