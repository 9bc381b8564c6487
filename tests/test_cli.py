"""CLI smoke tests (north rule: spark-submit --py-files launch surface).

cmd_run reuses the active test SparkSession (the same branch spark-submit
takes), so these run the real argument-parsing + pipeline wiring without a
second JVM.
"""

import json
import zipfile

from webdedup.cli import main


def test_cli_package(tmp_path):
    out = tmp_path / "webdedup.zip"
    main(["package", "--out", str(out)])
    names = zipfile.ZipFile(out).namelist()
    assert "webdedup/cli.py" in names
    assert "webdedup/pipeline.py" in names


def test_cli_synth_and_run_rule(spark, tmp_path, capsys):
    data = tmp_path / "data"
    main(["synth", "--n-docs", "120", "--seed", "5", "--out", str(data), "--partitions", "4"])
    out = tmp_path / "out_rule"
    main(
        [
            "run",
            "--input", f"{data}/pages",
            "--output", str(out),
            "--checkpoint", str(tmp_path / "ck_rule"),
        ]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 120
    assert stats["n_dup_groups"] >= 1
    assert (out / "clusters" / "_SUCCESS").exists()


def test_cli_run_keeper_best(spark, tmp_path, capsys):
    """--keeper best exercises the <output>/keepers write path end-to-end:
    one surviving member per gid, no golden output."""
    data = tmp_path / "data"
    main(["synth", "--n-docs", "120", "--seed", "7", "--out", str(data), "--partitions", "4"])
    out = tmp_path / "out_keep"
    main(
        [
            "run",
            "--input", f"{data}/pages",
            "--output", str(out),
            "--checkpoint", str(tmp_path / "ck_keep"),
            "--keeper", "best",
        ]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 120
    assert (out / "keepers" / "_SUCCESS").exists()
    assert not (out / "golden").exists()
    keepers = spark.read.parquet(str(out / "keepers"))
    clusters = spark.read.parquet(str(out / "clusters"))
    n_gids = clusters.select("gid").distinct().count()
    assert keepers.count() == n_gids
    assert keepers.select("gid").distinct().count() == n_gids


def test_cli_run_ml_decision(spark, tmp_path, capsys):
    data = tmp_path / "data"
    main(["synth", "--n-docs", "300", "--seed", "9", "--out", str(data), "--partitions", "4"])
    out = tmp_path / "out_ml"
    main(
        [
            "run",
            "--input", f"{data}/pages",
            "--output", str(out),
            "--decision", "ml",
            "--truth", f"{data}/truth_pairs",
            "--n-questions", "25",
        ]
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 300
    assert stats["n_dup_groups"] >= 1
