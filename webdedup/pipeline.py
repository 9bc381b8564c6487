"""End-to-end dedup pipeline — the PruningPipe equivalent.

Stage DAG (each stage optionally a checkpointed snapshot table):

  pages ─ signatures ─┬─ minhash band candidates ──┐
        │             └─ simhash block candidates ─┤
        ├─ exact text-hash candidates ─────────────┼─ union ─ features ─ decide ─ CC ─ clusters ─ golden
        └─ substring anchor candidates ─ verify ───┘

Mirrors the reference's flagship `PruningPipe._pipe`
(suricate/pipeline/pruningpipe.py:59-135): candidates == its pruned pair
space, features == its score matrix, decide == triage + classifier +
assembly, CC == its `SingleGrouping` transitive gid propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webdedup import candidates as cand
from webdedup import substring as sub
from webdedup.checkpoint import Checkpointer, input_fingerprint
from webdedup.cluster import assign_clusters, connected_components, golden_records
from webdedup.config import DedupConfig
from webdedup.features import compute_features
from webdedup.signatures import compute_signatures
from webdedup.triage import triage_rule


def run_dedup(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    checkpoint_dir: str | None = None,
    with_substring: bool = True,
    with_golden: bool = True,
    decision: str = "rule",
    truth_pairs: DataFrame | None = None,
    n_questions: int = 20,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every intermediate as a DataFrame.

    pages: (url, warc_ts?, html?, text, lang?) — url unique non-null.

    decision: 'rule' (default — the FunctionClassifier-style triage rule)
    or 'ml' (the reference flagship's learned path: question-loop label
    budget from ``truth_pairs`` -> GBT -> PruningPipe assembly; requires
    ``truth_pairs`` with (url_a, url_b) of known matches).

    EAGER by contract: this runner executes the stages at call time even
    without a checkpoint_dir (the candidate count sizes the feature
    repartition, triage collects its thresholds, CC iterates) and releases
    the candidate key-table caches before returning.  A caller that wants
    ONE stage lazily should call that stage's function directly
    (compute_signatures, candidates.minhash_candidates, ...) — they
    compose on plain DataFrames.
    """
    if decision not in ("rule", "ml"):
        raise ValueError("decision must be 'rule' or 'ml'")
    if decision == "ml" and truth_pairs is None:
        raise ValueError("decision='ml' requires truth_pairs (the labeler)")
    cfg = cfg or DedupConfig()
    ckpt = (
        Checkpointer(spark, checkpoint_dir, cfg) if checkpoint_dir else None
    )
    fp = input_fingerprint(pages, ["url"]) if ckpt else ""

    def staged(name, fn, parents=None, extra="", **kw):
        if ckpt:
            return ckpt.stage(
                name, fn, parents=parents or [], input_fingerprint=fp + extra, **kw
            )
        # no checkpoint dir: persist in memory/disk — each stage feeds several
        # consumers (e.g. signatures -> minhash + simhash candidate sources)
        return fn().persist()

    # Checkpoint tables are hash-partitioned by url (Iceberg-shaped layout,
    # SURVEY §4.2): resume and downstream scans read a bounded, pruned file
    # set instead of one flat directory; the `part` column is dropped after
    # the stage so downstream schemas stay unchanged.
    _PART_N = 16

    def _with_part(df: DataFrame, col: str) -> DataFrame:
        return df.withColumn("part", F.pmod(F.xxhash64(col), F.lit(_PART_N)))

    # -- 1. signatures -------------------------------------------------------
    signatures = staged(
        "signatures",
        lambda: _with_part(compute_signatures(pages, cfg), "url"),
        partition_by=["part"] if ckpt else None,
    ).drop("part")

    # -- 2. candidates (four sources, provenance-tagged) ---------------------
    skew_sources: list[DataFrame] = []

    def build_candidates() -> DataFrame:
        # all sources in did space; urls rejoin ONCE after the union dedup
        # (two joins total, vs two per source — see candidates.rejoin_urls)
        mh_pairs, mh_skew = cand.minhash_candidates(signatures, cfg, did_pairs=True)
        sh_pairs, sh_skew = cand.simhash_candidates(signatures, cfg, did_pairs=True)
        ex_pairs = cand.exact_candidates(pages, did_pairs=True)
        skew_sources[:] = [mh_skew, sh_skew]
        sources = [mh_pairs, sh_pairs, ex_pairs]
        if with_substring:
            ss_pairs, ss_skew = sub.substring_candidates(pages, cfg, did_pairs=True)
            verified, verify_skew = sub.verify_overlaps(
                ss_pairs, pages, cfg, with_metrics=True
            )
            skew_sources.extend([ss_skew, verify_skew])
            sources.append(
                verified.select("did_a", "did_b").withColumn(
                    "method", F.lit("substring")
                )
            )
        return cand.rejoin_urls(
            cand.union_candidates(*sources), cand.doc_ids(pages)
        )

    def candidate_metrics(_out: DataFrame) -> dict:
        """Per-method dropped skew mass -> the stage manifest, so a run can
        audit what the bucket caps cost (north rule: capped mass is
        reported, never silent).  Cost: the minhash/simhash skew aggregates
        re-run their band/block explode + two-phase count from the
        signatures snapshot (those key tables are deliberately NOT
        persisted — pinning the job's dominant shuffle payload in RAM to
        save one bounded metrics job is the wrong trade at scale); the
        substring aggregates read their persisted key tables."""
        if not skew_sources:
            return {}
        from functools import reduce

        union = reduce(lambda a, b: a.unionByName(b), skew_sources)
        return {"skew_drops": [r.asDict() for r in union.collect()]}

    pairs = staged(
        "candidates",
        lambda: _with_part(build_candidates(), "url_a"),
        parents=["signatures"],
        partition_by=["part"] if ckpt else None,
        metrics=candidate_metrics if ckpt else None,
    ).drop("part")

    # pair count: free from the stage manifest when checkpointed, else one
    # count that also MATERIALIZES the persisted pair list — after which the
    # key-table caches inside the candidate sources are dead weight
    n_pairs = (
        ckpt.manifest("candidates")["row_count"] if ckpt else pairs.count()
    )
    cand.release_key_caches()

    # -- 3. features ----------------------------------------------------------
    docs = pages.select("url", "text", "lang").join(
        signatures.select("url", "shingles", "mini", "simhash"), "url"
    )
    # expensive ratio comparators only for triage-mixed pairs — the
    # reference's pruning semantics (PruningPipe scores only mixed pairs
    # with the apply comparators, pruningpipe.py:102-107)
    features = staged(
        "features",
        lambda: compute_features(pairs, docs, cfg, ratios_for="mixed", n_pairs=n_pairs),
        parents=["candidates"],
    )

    # -- 4. decision: rule triage, or the learned question-loop path ---------
    if decision == "ml":
        from webdedup.classify import run_ml_decision

        # decision mode + budget + the LABEL CONTENT are the stage identity:
        # a rule-decisions checkpoint must never resume as ml output, and a
        # re-run with different truth labels (same pages, same dir) must not
        # resume decisions trained on the old labels
        truth_fp = (
            input_fingerprint(truth_pairs, ["url_a", "url_b"]) if ckpt else ""
        )
        decided = staged(
            "decisions",
            lambda: run_ml_decision(
                features, truth_pairs, cfg, n_questions=n_questions
            ),
            parents=["features"],
            extra=f":decision=ml:q={n_questions}:truth={truth_fp}",
        )
    else:

        def decision_metrics(out_df: DataFrame) -> dict:
            """Per-method positive-pair attribution -> the stage manifest
            (the tiered-dedup audit: which candidate source the accepted
            pairs came from, so a run can see what each tier of the
            cascade paid for).  Bounded collect: <= one row per method."""
            rows = (
                out_df.where(F.col("is_dup") == 1)
                .select(F.explode("methods").alias("method"))
                .groupBy("method")
                .count()
                .collect()
            )
            return {"positive_pairs_by_method": {r["method"]: r["count"] for r in rows}}

        decided = staged(
            "decisions",
            lambda: triage_rule(features, cfg),
            parents=["features"],
            metrics=decision_metrics if ckpt else None,
        )
    matches = decided.where(F.col("is_dup") == 1)

    # -- 5. connected components -> gid --------------------------------------
    def build_clusters() -> DataFrame:
        comp = connected_components(matches.select("url_a", "url_b"))
        return assign_clusters(pages.select("url", "warc_ts", "text", "lang"), comp).select(
            "url", "gid"
        )

    clusters = staged("clusters", build_clusters, parents=["decisions"])

    out: dict[str, DataFrame] = {
        "signatures": signatures,
        "candidates": pairs,
        "features": features,
        "decisions": decided,
        "clusters": clusters,
    }

    # -- 6. golden records -----------------------------------------------------
    if with_golden:
        clustered = pages.join(clusters, "url")
        out["golden"] = staged(
            "golden",
            lambda: golden_records(
                clustered,
                policies={"url": "first", "text": "first", "lang": "popularity"},
            ),
            parents=["clusters"],
        )

    if ckpt:
        out["_checkpointer"] = ckpt  # type: ignore[assignment]
    return out
