"""Builds the spark-submit artifact: dist/hugegraph_computer_spark.zip.

The engine is a pure-Python package, so cluster deployment is exactly
the north-star recipe:

    python tools/package.py
    spark-submit --master <cluster> \
        --py-files dist/hugegraph_computer_spark.zip \
        tools/submit_job.py <transcript-source>

The zip contains only the package's .py files (no tests/tools/oracles
needed on executors' sys.path beyond the package itself).
tests/test_submit.py runs this end-to-end via a real spark-submit with
a scrubbed environment, proving the zip is self-contained.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "hugegraph_computer_spark"


def build_zip(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_root):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build_zip())
