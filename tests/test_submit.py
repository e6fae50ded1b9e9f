"""spark-submit --py-files packaging (the north-star deployment path):
build the zip, then run the sample job through a REAL spark-submit with
a scrubbed environment and a neutral cwd, so the engine import can only
come from the --py-files artifact."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_py_files_submit(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package import build_zip

    zip_path = build_zip(str(tmp_path / "hugegraph_computer_spark.zip"))

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the only source
    }
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            SF_DIR,
            "5",
        ],
        cwd=str(tmp_path),  # neutral cwd: repo dir not importable
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["vertices"] == 1008
    assert out["edges"] == 1560
    assert out["supersteps"] == 5
    assert len(out["top5"]) == 5
    # rank mass concentrates on the hub nodes (known sf0.001 topology)
    assert out["top5"][0]["id"].startswith(("tool:", "role:"))
