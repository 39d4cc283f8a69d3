"""Build the --py-files archive for cluster deployment (north rule:
"deploys with spark-submit --py-files across multi-executor clusters").

    python tools/make_pyfiles.py [out.zip]      # default: linkgraph.zip

then from any machine with Spark + the archive + a jobs/ script:

    spark-submit --master <cluster> --py-files linkgraph.zip \
        jobs/run_algo.py --algo wcc --edges <parquet> --output <path>

The zip contains only the package's .py files (no tests, no caches) with
fixed timestamps, so rebuilding from the same tree is byte-identical —
a content-addressable artifact for cluster-side caching.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "neo4j_graph_algorithms_spark"


def build(out: str, repo_root: str | None = None) -> int:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirs, files in os.walk(os.path.join(root, PKG)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                src = os.path.join(dirpath, f)
                arc = os.path.relpath(src, root)
                # fixed date -> deterministic archive bytes
                info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                info.external_attr = 0o644 << 16
                with open(src, "rb") as fh:
                    zf.writestr(info, fh.read())
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "linkgraph.zip"
    n = build(out)
    print(f"{out}: {n} files")
