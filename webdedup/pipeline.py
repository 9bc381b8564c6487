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
from webdedup.cluster import (
    assign_clusters,
    connected_components,
    default_keeper_score,
    golden_records,
    keep_best,
    release_checkpoints,
)
from webdedup.config import DedupConfig
from webdedup.features import compute_features, release_doc_caches
from webdedup.signatures import compute_signatures
from webdedup.triage import triage_rule


def _column_identity(df: DataFrame, col) -> str:
    """Stable identity string for a Column expression: the pretty-SQL name
    the analyzer assigns when the expression is resolved against ``df``
    (public API, analysis only — no job).  Column.__repr__ is NOT used:
    its format carries no stability guarantee across Spark versions, so a
    version bump could silently change every stage identity derived from
    it (spurious recompute of otherwise-valid checkpoints)."""
    try:
        return df.select(col).columns[0]
    except Exception:  # unresolvable against df: fall back to the repr
        return str(col)


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
    cross_validate: bool = False,
    keeper: str = "golden",
    keeper_score=None,
) -> dict[str, DataFrame]:
    """Run the full pipeline; returns every intermediate as a DataFrame.

    pages: (url, warc_ts?, html?, text, lang?) — url unique non-null.

    decision: 'rule' (default — the FunctionClassifier-style triage rule)
    or 'ml' (the reference flagship's learned path: question-loop label
    budget from ``truth_pairs`` -> GBT -> PruningPipe assembly; requires
    ``truth_pairs`` with (url_a, url_b) of known matches).
    cross_validate: ml path only — wrap the GBT pipeline in the
    CrossValidator grid (classify.fit_classifier).

    keeper: what stage 6 emits when with_golden is true — 'golden'
    (default: per-column synthesized golden record, the reference's
    grouping.py policy table) or 'best' (keep-best-copy: ONE surviving
    member per gid, the training-pipeline keeper policy; out key
    'keepers').  keeper_score: Column scoring each member for 'best'
    (higher = kept); default cluster.default_keeper_score — unique-token
    ratio over an explicit whitespace class.

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
    if keeper not in ("golden", "best"):
        raise ValueError("keeper must be 'golden' or 'best'")
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
    # the part column exists only on the checkpointed layout: in-memory
    # stages persist the frame AS RETURNED, so the caller's unpersist on the
    # dict entry releases the actual cache (a drop() AFTER persist would
    # hand out a child plan whose unpersist misses the cached parent)
    signatures = staged(
        "signatures",
        (lambda: _with_part(compute_signatures(pages, cfg), "url"))
        if ckpt
        else (lambda: compute_signatures(pages, cfg)),
        partition_by=["part"] if ckpt else None,
    )
    if ckpt:
        signatures = signatures.drop("part")

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
        (lambda: _with_part(build_candidates(), "url_a"))
        if ckpt
        else build_candidates,
        parents=["signatures"],
        partition_by=["part"] if ckpt else None,
        metrics=candidate_metrics if ckpt else None,
    )
    if ckpt:
        pairs = pairs.drop("part")

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
    if ckpt:
        # the stage parquet write above already materialized the feature
        # table — the doc-side cache compute_features persisted is dead
        # weight now.  The non-ckpt path releases after the clusters
        # action instead (the features persist fills transitively there).
        release_doc_caches()

    # -- 4. decision: rule triage, or the learned question-loop path ---------
    def decision_metrics(out_df: DataFrame) -> dict:
        """Per-method positive-pair attribution -> the stage manifest
        (the tiered-dedup audit: which candidate source the accepted
        pairs came from, so a run can see what each tier of the
        cascade paid for) — recorded for BOTH decision paths, so an ml
        run keeps the same audit trail a rule run has.  Bounded collect:
        <= one row per method."""
        rows = (
            out_df.where(F.col("is_dup") == 1)
            .select(F.explode("methods").alias("method"))
            .groupBy("method")
            .count()
            .collect()
        )
        m: dict = {"positive_pairs_by_method": {r["method"]: r["count"] for r in rows}}
        if decision == "ml":
            # the learned path's knobs belong in the manifest next to its
            # output: budget size and CV choice explain WHY these decisions
            m["decision"] = "ml"
            m["n_questions"] = n_questions
            m["cross_validate"] = cross_validate
        return m

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
                features,
                truth_pairs,
                cfg,
                n_questions=n_questions,
                cross_validate=cross_validate,
            ),
            parents=["features"],
            extra=f":decision=ml:q={n_questions}:cv={cross_validate}:truth={truth_fp}",
            metrics=decision_metrics if ckpt else None,
        )
    else:
        decided = staged(
            "decisions",
            lambda: triage_rule(features, cfg),
            parents=["features"],
            metrics=decision_metrics if ckpt else None,
        )
    matches = decided.where(F.col("is_dup") == 1)

    # -- 5. connected components -> gid --------------------------------------
    # this run OWNS its CC checkpoint registry: releasing the process-global
    # one would also free star forests another concurrent CC consumer
    # (stream micro-batch, second run_dedup on the same session) still reads
    cc_handles: list[DataFrame] = []

    def build_clusters() -> DataFrame:
        comp = connected_components(
            matches.select("url_a", "url_b"), checkpoints=cc_handles
        )
        return assign_clusters(pages.select("url", "warc_ts", "text", "lang"), comp).select(
            "url", "gid"
        )

    clusters = staged("clusters", build_clusters, parents=["decisions"])
    if not ckpt:
        # one count materializes the persisted stage, after which the
        # star-forest blocks connected_components retained are dead — the
        # released lineage is unrecoverable, so the materialization must
        # come FIRST (the stage persist is disk-backed; local-mode block
        # loss means process death, the same failure class localCheckpoint
        # already has).  The same count transitively fills the
        # features/decisions persists, so the doc-side cache inside
        # compute_features is releasable here too (the ckpt path released
        # it at the features stage write; build_clusters ALWAYS runs on
        # this path, so the count is never an extra action).
        clusters.count()
        release_doc_caches()
    # empty registry: fully-resumed checkpointed run, or a zero-duplicate
    # edge set CC released inline — nothing to free either way
    if cc_handles:
        release_checkpoints(cc_handles)

    out: dict[str, DataFrame] = {
        "signatures": signatures,
        "candidates": pairs,
        "features": features,
        "decisions": decided,
        "clusters": clusters,
    }

    # -- 6. keeper: golden-record synthesis, or keep-best-copy ---------------
    if with_golden:
        clustered = pages.join(clusters, "url")
        if keeper == "best":
            score = (
                keeper_score
                if keeper_score is not None
                else default_keeper_score("text")
            )
            out["keepers"] = staged(
                "keepers",
                lambda: keep_best(
                    clustered.withColumn("keeper_score", score).select(
                        "url", "gid", "keeper_score"
                    ),
                    "keeper_score",
                ),
                parents=["clusters"],
                # the score EXPRESSION is part of the stage identity: a
                # resume with a different quality score must recompute
                extra=f":keeper_score={_column_identity(clustered, score)}",
            )
        else:
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
