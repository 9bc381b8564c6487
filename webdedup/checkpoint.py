"""Stage checkpointing with manifests: snapshot tables + per-partition
lineage + metrics, and skip-if-already-computed resume.

The reference hands intermediate results between stages through Postgres
tables (`df_source`, `es_scores`, `es_sbs`, `cluster_output`, ...,
tutorial/main/stepbystep/e2e.py:242-281) — its own argument for checkpointed
resumable stages.  Real Iceberg would give us snapshots + metadata tables;
offline (no Iceberg jar in this image) we emulate the layout: each stage is a
partitioned-parquet snapshot directory plus a JSON manifest recording

  - the pinned DedupConfig hash (semantic identity of the pipeline),
  - the parent stages' manifest hashes (lineage chain),
  - row count and per-partition row counts (lineage + skew visibility),
  - arbitrary stage metrics.

`Checkpointer.stage()` recomputes a stage only when its identity hash
(config + parents + stage name) has no matching manifest on disk — a killed
run resumes from the last completed stage.  The interface is kept
Iceberg-shaped (a stage == a table write) so a real catalog can swap in.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webdedup.config import DedupConfig

MANIFEST_NAME = "manifest.json"


def _partition_counts(df: DataFrame) -> dict[str, int]:
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return {str(r["__pid"]): int(r["count"]) for r in rows}


class Checkpointer:
    """Resumable stage runner over a snapshot directory tree.

    root/
      <stage>/data/*.parquet     the snapshot
      <stage>/manifest.json      lineage + metrics
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        cfg: DedupConfig,
        writer: Callable[[DataFrame, str], None] | None = None,
        reader: Callable[[str], DataFrame] | None = None,
    ):
        """writer/reader: the table-format swap-in seam.  Default None =
        the offline partitioned-parquet emulation.  A real catalog plugs in
        as ``writer=lambda df, stage: df.writeTo(f"cat.db.{stage}")
        .createOrReplace()`` and ``reader=lambda stage:
        spark.table(f"cat.db.{stage}")`` — stage identity, manifests,
        lineage, resume validation and the events log are format-agnostic
        and stay exactly as they are (tests/test_round5.py runs the seam
        against a real Iceberg catalog when the runtime jar is present,
        and against a second parquet tree offline)."""
        self.spark = spark
        self.root = Path(root)
        self.cfg = cfg
        self.config_hash = cfg.config_hash()
        self._writer = writer
        self._reader = reader
        self._stage_hashes: dict[str, str] = {}
        self.events: list[dict] = []  # (stage, action) log for tests/CLI

    # -- identity ----------------------------------------------------------
    def _identity(self, stage: str, parents: list[str], extra: str = "") -> str:
        parent_hashes = [self._stage_hashes.get(p, p) for p in parents]
        payload = json.dumps(
            {"stage": stage, "config": self.config_hash, "parents": parent_hashes,
             "extra": extra},
            sort_keys=True,
        ).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def _paths(self, stage: str) -> tuple[Path, Path]:
        d = self.root / stage
        return d / "data", d / MANIFEST_NAME

    # -- core --------------------------------------------------------------
    def stage(
        self,
        name: str,
        compute: Callable[[], DataFrame],
        parents: list[str] | None = None,
        metrics: Callable[[DataFrame], dict] | None = None,
        input_fingerprint: str = "",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage; returns the snapshot-backed DataFrame."""
        parents = parents or []
        identity = self._identity(name, parents, input_fingerprint)
        data_dir, manifest_path = self._paths(name)

        if manifest_path.exists():
            manifest = json.loads(manifest_path.read_text())
            if manifest.get("identity") == identity:
                # trust-but-verify: the manifest alone can outlive a partial
                # overwrite of the snapshot (killed rewrite, manual
                # deletion).  The snapshot is only resumable if the commit
                # marker exists (parquet layout; a catalog reader validates
                # by readability alone — its commits are atomic) AND the row
                # count still matches what the manifest recorded; otherwise
                # fall through and recompute.
                if self._reader is not None or (data_dir / "_SUCCESS").exists():
                    try:
                        snap = self._read_stage(name, data_dir)
                        ok = snap.count() == manifest.get("row_count")
                    except Exception:
                        # marker survived but the data didn't (all part
                        # files deleted -> AnalysisException; truncated ->
                        # decode error; dropped table): recompute rather
                        # than wedging the run
                        ok = False
                    if ok:
                        self._stage_hashes[name] = identity
                        self.events.append({"stage": name, "action": "resumed"})
                        return snap
                self.events.append({"stage": name, "action": "invalid_snapshot"})

        t0 = time.time()
        df = compute()
        if self._writer is not None:
            self._writer(df, name)
        else:
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(data_dir))
        out = self._read_stage(name, data_dir)

        manifest = {
            "stage": name,
            "identity": identity,
            "config_hash": self.config_hash,
            "parents": {p: self._stage_hashes.get(p, p) for p in parents},
            "row_count": out.count(),
            "partition_counts": _partition_counts(out),
            "schema": out.schema.jsonValue(),
            "wall_seconds": round(time.time() - t0, 3),
            "written_at_unix": int(time.time()),
            "metrics": (metrics(out) if metrics else {}),
        }
        manifest_path.parent.mkdir(parents=True, exist_ok=True)
        manifest_path.write_text(json.dumps(manifest, indent=2, default=str))
        self._stage_hashes[name] = identity
        self.events.append({"stage": name, "action": "computed"})
        return out

    def _read_stage(self, name: str, data_dir: Path) -> DataFrame:
        if self._reader is not None:
            return self._reader(name)
        return self.spark.read.parquet(str(data_dir))

    def manifest(self, stage: str) -> dict:
        _, manifest_path = self._paths(stage)
        return json.loads(manifest_path.read_text())


def input_fingerprint(df: DataFrame, key_cols: list[str]) -> str:
    """Cheap content identity for resume-safety: count + xor-ish hash sum."""
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*key_cols).cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return f"{int(row['n'])}:{int(row['h'])}"
