"""Package flume_elasticsearch_2_spark into a --py-files zip (dist/fts_pkg.zip).

The north_rule's deployment shape: `spark-submit --py-files dist/fts_pkg.zip
<driver>.py` ships the whole engine to every executor — no install step on
the cluster.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "flume_elasticsearch_2_spark"


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "fts_pkg.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for name in sorted(filenames):
                if name.endswith(".py"):
                    full = os.path.join(dirpath, name)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build_zip())
