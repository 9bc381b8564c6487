"""Deterministic synthetic web-page corpus with planted duplicate structure.

Plays the role of suricate's packaged fixtures: ``foo`` / ``circus``
(suricate/data/foo.py:8-78, circus.py:6-69) and the golden labeled corpus
``companies`` + ``ytrue.csv`` (suricate/data/companies.py:9-60).  Instead of
shipping CSVs we generate the corpus as a pure function of a seed — identical
under any parallelism, rebuildable without Spark (pandas/numpy only).

Output schema (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
Ground truth (the ytrue.csv analogue):
    truth_pairs(url_a, url_b, dup_type)   with url_a < url_b
    truth_clusters(url, gid)              gid = min url in the planted cluster

Planted duplicate types:
    exact      - same text, different url
    near       - token-level edit noise at 2-10% (MinHash/SimHash recall)
    substring  - one doc embeds a >=200-char span of another (suffix-anchor pass)
plus singletons (negatives) and a shared boilerplate header/footer on a
fraction of pages (the LSH-bucket skew driver).
"""

from __future__ import annotations

import itertools
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

_WORDS = (
    "data spark query table row column value batch stream window merge join "
    "filter sort hash key scan group agg vector line order part customer fast "
    "slow big small the a cloud index cache shard block page crawl corpus token "
    "shingle signature bucket cluster record field text html parse fetch serve "
    "rank score match label model train split node edge graph component"
).split()

_LANGS = ["en", "de", "fr", "es", "zh"]

_BOILER_HEADER = "cookie notice accept all cookies privacy policy terms of service navigation menu "
_BOILER_FOOTER = " copyright all rights reserved contact us subscribe newsletter follow social"

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _base_text(rng: np.random.Generator, n_tokens: int) -> str:
    return " ".join(rng.choice(_WORDS, size=n_tokens))


def _near_dup(rng: np.random.Generator, text: str, noise: float) -> str:
    """Token-level edit noise: substitute/delete/insert each token w.p. noise."""
    toks = text.split()
    out: list[str] = []
    ops = rng.random(len(toks))
    kinds = rng.integers(0, 3, size=len(toks))
    subs = rng.choice(_WORDS, size=len(toks))
    for i, t in enumerate(toks):
        if ops[i] >= noise:
            out.append(t)
        elif kinds[i] == 0:          # substitute
            out.append(str(subs[i]))
        elif kinds[i] == 1:          # delete
            continue
        else:                        # insert
            out.append(t)
            out.append(str(subs[i]))
    return " ".join(out) if out else text


def make_url(i: int, n_sites: int = 20) -> str:
    return f"https://site{i % n_sites}.example/p/{i:08d}"


def generate_pages(
    n_docs: int = 1000,
    seed: int = 42,
    dup_fraction: float = 0.3,
    boiler_fraction: float = 0.25,
    index_offset: int = 0,
    text_scale: int = 1,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (pages, truth_pairs, truth_clusters) pandas frames.

    ``n_docs`` counts total emitted rows (bases + planted duplicates).
    ``index_offset`` shifts every row index (distinct urls across the
    partitions of the distributed generator below).  ``text_scale``
    multiplies the base token-count range (1 -> ~80-token snippets,
    5 -> ~2.5 KB Common-Crawl-sized pages).
    """
    rng = np.random.default_rng(seed)

    rows: list[dict] = []          # url, text, lang, boiler
    clusters: list[list[int]] = [] # row indices per planted cluster
    dup_types: dict[tuple[int, int], str] = {}

    i = 0
    while i < n_docs:
        n_tokens = int(rng.integers(30 * text_scale, 120 * text_scale))
        text = _base_text(rng, n_tokens)
        # boilerplate skew applied at base time so planted exact dups stay
        # byte-identical and variants inherit the boilerplate
        if rng.random() < boiler_fraction:
            text = _BOILER_HEADER + text + _BOILER_FOOTER
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        members = [i + index_offset]
        rows.append({"i": i + index_offset, "text": text, "lang": lang})
        i += 1
        if rng.random() < dup_fraction and i < n_docs:
            n_variants = int(rng.integers(1, 4))
            for _ in range(n_variants):
                if i >= n_docs:
                    break
                kind = rng.choice(["exact", "near", "substring"], p=[0.25, 0.5, 0.25])
                if kind == "substring" and len(text) < 260:
                    kind = "near"  # base too short to plant a >=200-char overlap
                if kind == "exact":
                    vtext = text
                elif kind == "near":
                    vtext = _near_dup(rng, text, noise=float(rng.uniform(0.02, 0.10)))
                else:  # substring: embed a long span of the base in fresh context
                    toks = text.split()
                    span_tok = max(len(toks) // 2, 40)
                    start = int(rng.integers(0, max(len(toks) - span_tok, 1)))
                    span = " ".join(toks[start : start + span_tok])
                    # pad the span so the common substring is comfortably >= 200 chars
                    while len(span) < 220 and len(toks) > 0:
                        span = " ".join(toks[: min(len(toks), span_tok + 10)])
                        span_tok += 10
                    pre = _base_text(rng, int(rng.integers(20, 60)))
                    post = _base_text(rng, int(rng.integers(20, 60)))
                    vtext = f"{pre} {span} {post}"
                # kind describes the base->variant relation; pairs between two
                # variants are reachable only transitively
                dup_types[(members[0], i + index_offset)] = str(kind)
                for m in members[1:]:
                    dup_types[(m, i + index_offset)] = "transitive"
                members.append(i + index_offset)
                rows.append({"i": i + index_offset, "text": vtext, "lang": lang})
                i += 1
        clusters.append(members)

    # assemble pages frame
    urls = [make_url(r["i"]) for r in rows]
    ts = [EPOCH + timedelta(seconds=int(r["i"]) * 37) for r in rows]
    htmls = []
    bad_utf8 = rng.random(len(rows)) < 0.02
    for r, bad in zip(rows, bad_utf8):
        body = b"<html><body>" + r["text"].encode("utf-8") + b"</body></html>"
        if bad:  # planted invalid UTF-8 in html only; text stays clean
            body = body[:12] + b"\xff\xfe\x80" + body[12:]
        htmls.append(body)

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )

    idx_to_url = {r["i"]: make_url(r["i"]) for r in rows}

    pair_rows = []
    for members in clusters:
        for a, b in itertools.combinations(sorted(members), 2):
            dt = dup_types.get((a, b)) or dup_types.get((b, a)) or "transitive"
            ua, ub = sorted((idx_to_url[a], idx_to_url[b]))
            pair_rows.append({"url_a": ua, "url_b": ub, "dup_type": dt})
    truth_pairs = pd.DataFrame(pair_rows, columns=["url_a", "url_b", "dup_type"])

    cluster_rows = []
    for members in clusters:
        gid = min(idx_to_url[m] for m in members)
        for m in members:
            cluster_rows.append({"url": idx_to_url[m], "gid": gid})
    truth_clusters = pd.DataFrame(cluster_rows, columns=["url", "gid"])

    return pages, truth_pairs, truth_clusters


def pages_spark_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def pages_to_spark(spark, pages: pd.DataFrame, partitions: int | None = None):
    df = spark.createDataFrame(pages, schema=pages_spark_schema())
    if partitions:
        df = df.repartition(partitions, "url")
    return df


def generate_pages_spark(
    spark,
    n_docs: int,
    seed: int = 42,
    partitions: int = 64,
    text_scale: int = 1,
    dup_fraction: float = 0.3,
    boiler_fraction: float = 0.25,
):
    """Distributed corpus generation for bench-scale inputs (pages only).

    Each partition runs the same pure generator over a disjoint index range
    with a partition-derived seed, so output is deterministic for a given
    (n_docs, seed, partitions, text_scale) regardless of cluster layout.
    Duplicate clusters are planted within a partition (planted structure is
    identical in kind to `generate_pages`; truth tables are not emitted —
    bench runs check determinism and throughput, recall evidence comes from
    the small-scale oracle tests)."""
    counts, offsets = _partition_plan(n_docs, partitions)

    def gen(batches):
        for pdf in batches:
            for p in pdf["id"]:
                p = int(p)
                pages, _, _ = generate_pages(
                    n_docs=counts[p],
                    seed=seed + 7919 * p,
                    dup_fraction=dup_fraction,
                    boiler_fraction=boiler_fraction,
                    index_offset=offsets[p],
                    text_scale=text_scale,
                )
                yield pages

    return (
        spark.range(partitions, numPartitions=partitions)
        .mapInPandas(gen, schema=pages_spark_schema())
    )


def _partition_plan(n_docs: int, partitions: int) -> tuple[list[int], list[int]]:
    """Per-partition (row counts, index offsets) — ONE owner so the pages
    generator and the truth replay below can never disagree."""
    per = n_docs // partitions
    counts = [per + (1 if p < n_docs % partitions else 0) for p in range(partitions)]
    offsets = [0] * partitions
    acc = 0
    for p in range(partitions):
        offsets[p] = acc
        acc += counts[p]
    return counts, offsets


def generate_truth_spark(
    spark,
    n_docs: int,
    seed: int = 42,
    partitions: int = 64,
    text_scale: int = 1,
    dup_fraction: float = 0.3,
    boiler_fraction: float = 0.25,
):
    """Planted truth pairs for a generate_pages_spark corpus: replays the
    IDENTICAL per-partition generator (same partition seeds/offsets, same
    knobs) and emits the truth_pairs table instead of the pages.  Lets a
    bench-scale corpus snapshot stay pages-only while an ml-path run still
    gets its 'human labeler' — call with the exact arguments the corpus was
    generated with."""
    counts, offsets = _partition_plan(n_docs, partitions)

    def gen(batches):
        for pdf in batches:
            for p in pdf["id"]:
                p = int(p)
                _, truth, _ = generate_pages(
                    n_docs=counts[p],
                    seed=seed + 7919 * p,
                    dup_fraction=dup_fraction,
                    boiler_fraction=boiler_fraction,
                    index_offset=offsets[p],
                    text_scale=text_scale,
                )
                yield truth

    return spark.range(partitions, numPartitions=partitions).mapInPandas(
        gen, schema="url_a string, url_b string, dup_type string"
    )
