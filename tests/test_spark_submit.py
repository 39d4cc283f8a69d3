"""End-to-end `spark-submit --py-files` deployment check (north rule:
"deploys with spark-submit --py-files across multi-executor clusters").

Builds linkgraph.zip with tools/make_pyfiles.py, then runs
jobs/run_algo.py through REAL spark-submit from a scratch cwd — the
package is importable only via the archive, exactly as on a cluster —
and checks the written component assignment.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_wcc(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    zip_path = str(tmp_path / "linkgraph.zip")
    n = build(zip_path, REPO)
    assert n > 40  # the whole package shipped
    # deterministic artifact: same tree -> byte-identical zip
    zip2 = str(tmp_path / "linkgraph2.zip")
    build(zip2, REPO)
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()

    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (3, 4, 1.0)], "src long, dst long, weight double"
    ).write.mode("overwrite").parquet(edges)

    out = str(tmp_path / "out_wcc")
    work = tmp_path / "work"  # scratch cwd: package NOT importable from here
    work.mkdir()
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "run_algo.py"),
            "--algo", "wcc", "--edges", edges, "--output", out,
        ],
        cwd=str(work),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = pd.read_parquet(out).sort_values("vid").reset_index(drop=True)
    assert list(got["vid"]) == [0, 1, 2, 3, 4]
    assert list(got["comp"]) == [0, 0, 0, 3, 3]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_checkpoint_resume(spark, tmp_path):
    """North rule end-to-end: a spark-submit job stopped mid-algorithm
    (here: LPA after 1 of 3 supersteps, durable state committed) resumes
    on resubmission with --resume and matches the uninterrupted run."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_pyfiles import build

    zip_path = str(tmp_path / "linkgraph.zip")
    build(zip_path, REPO)

    edges = str(tmp_path / "edges")
    ring = [(i, (i + 1) % 10, 1.0) for i in range(10)] + [(2, 7, 5.0)]
    spark.createDataFrame(
        ring, "src long, dst long, weight double"
    ).write.mode("overwrite").parquet(edges)

    def submit(extra, out):
        proc = subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[2]",
                "--conf", "spark.sql.shuffle.partitions=2",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "run_algo.py"),
                "--algo", "lpa", "--edges", edges, "--output", out, *extra,
            ],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return pd.read_parquet(out).sort_values("vid").reset_index(drop=True)

    ck = str(tmp_path / "ck")
    full = submit(["--config", '{"iterations": 3}'], str(tmp_path / "o_full"))
    partial = submit(
        ["--config", '{"iterations": 1}', "--checkpoint-dir", ck],
        str(tmp_path / "o_partial"),
    )
    resumed = submit(
        ["--config", '{"iterations": 3}', "--checkpoint-dir", ck, "--resume"],
        str(tmp_path / "o_resumed"),
    )
    assert os.path.exists(os.path.join(ck, "state", "iter=1", "_SUCCESS"))
    assert not partial["label"].equals(full["label"])  # 1 iter genuinely partial
    pd.testing.assert_frame_equal(resumed[["vid", "label"]], full[["vid", "label"]])
