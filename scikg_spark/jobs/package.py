"""Build dist/scikg_spark.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile


def build_zip(out_path="dist/scikg_spark.zip") -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pkg_dir = os.path.join(repo_root, "scikg_spark")
    os.makedirs(os.path.dirname(os.path.join(repo_root, out_path)), exist_ok=True)
    target = os.path.join(repo_root, out_path)
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, repo_root))
    return target


if __name__ == "__main__":
    print(build_zip())
