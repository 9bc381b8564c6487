"""North-rule launch contract: the pipeline runs via `spark-submit
--py-files webdedup.zip` with the library imported FROM THE ZIP (reference
ships as a pip package run in-process; our unit of deployment is the zip a
cluster submit ships to executors).

The test packages the library, copies cli.py to a neutral directory (so
nothing resolves from the repo checkout), and drives a real spark-submit
subprocess end-to-end on a small synthetic corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    from shutil import which

    exe = which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark

        cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        if cand.exists():
            return str(cand)
    except ImportError:
        pass
    return None


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    exe = _spark_submit()
    if exe is None:
        pytest.skip("no spark-submit on PATH or in the pyspark install")

    # 1. package the library zip (what --py-files ships to executors)
    from webdedup.cli import main as cli_main

    zip_path = tmp_path / "webdedup.zip"
    cli_main(["package", "--out", str(zip_path)])
    assert zip_path.stat().st_size > 10_000

    # 2. small corpus written by the in-process session (synth is seeded)
    from webdedup.synth import generate_pages, pages_to_spark

    pages_pd, truth_pairs, _ = generate_pages(n_docs=300, seed=7)
    pages_to_spark(spark, pages_pd, partitions=8).write.mode("overwrite").parquet(
        str(tmp_path / "pages")
    )

    # 3. neutral launch dir: only cli.py + the zip are visible, so every
    # `import webdedup.*` inside the job must resolve from the --py-files zip
    launch = tmp_path / "launch"
    launch.mkdir()
    shutil.copy(REPO / "webdedup" / "cli.py", launch / "cli.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # drop any path that reaches the repo
    }
    env["PYTHONPATH"] = str(zip_path)  # driver-side import source = the zip
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    env.setdefault("SPARK_DRIVER_MEMORY", "4g")

    out = subprocess.run(
        [
            exe,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=16",
            "--conf",
            "spark.driver.memory=4g",
            "--py-files",
            str(zip_path),
            str(launch / "cli.py"),
            "run",
            "--input",
            str(tmp_path / "pages"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
            "--output",
            str(tmp_path / "out"),
            "--cores",
            "4",
        ],
        cwd=str(launch),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    stats = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["n_docs"] == 300
    assert stats["n_dup_groups"] > 0  # synth plants duplicate clusters

    # the run wrote clusters through the checkpointed pipeline
    clusters = spark.read.parquet(str(tmp_path / "out" / "clusters"))
    assert clusters.count() == 300
    assert set(clusters.columns) >= {"url", "gid"}
