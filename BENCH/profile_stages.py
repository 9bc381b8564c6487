"""Per-stage wall-clock profile of the dedup pipeline — finds the bottleneck.

Each stage is forced with a noop write AFTER its inputs are materialized
(persisted + counted), so the timing isolates that stage's own work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webdedup import candidates as cand  # noqa: E402
from webdedup import substring as sub  # noqa: E402
from webdedup.cluster import assign_clusters, connected_components  # noqa: E402
from webdedup.config import DedupConfig  # noqa: E402
from webdedup.features import compute_features  # noqa: E402
from webdedup.session import get_spark, warm_python_workers  # noqa: E402
from webdedup.signatures import compute_signatures  # noqa: E402
from webdedup.triage import triage_rule  # noqa: E402


def timed(name, fn, timings):
    t0 = time.time()
    out = fn()
    timings[name] = round(time.time() - t0, 2)
    print(f"  {name}: {timings[name]}s", flush=True)
    return out


def force(df):
    df = df.persist()
    n = df.count()
    return df, n


def main() -> None:
    cores = int(os.environ.get("PROF_CORES", "8"))
    input_dir = os.environ.get("PROF_INPUT", "BENCH/data/pages_8000")
    cfg = DedupConfig()
    extra = {}
    if os.environ.get("PROF_EVENTLOG"):
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:///tmp/spark-events",
        }
    spark = get_spark(app_name=f"profile-{cores}", cores=cores, extra_conf=extra)
    warm_python_workers(spark, cores)
    if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
        from webdedup.synth import generate_pages, pages_to_spark

        n_docs = int(os.environ.get("PROF_NDOCS", "8000"))
        pages_pd, _, _ = generate_pages(n_docs=n_docs, seed=42)
        pages_to_spark(spark, pages_pd, partitions=32).write.mode(
            "overwrite"
        ).parquet(input_dir)
    pages = spark.read.parquet(input_dir).persist()
    n = pages.count()
    print(f"docs={n} cores={cores}", flush=True)

    t: dict[str, float] = {}
    sigs, _ = timed("signatures", lambda: force(compute_signatures(pages, cfg)), t)

    mh, nmh = timed("minhash_cand", lambda: force(cand.minhash_candidates(sigs, cfg)[0]), t)
    sh, nsh = timed("simhash_cand", lambda: force(cand.simhash_candidates(sigs, cfg)[0]), t)
    ex, nex = timed("exact_cand", lambda: force(cand.exact_candidates(pages)), t)
    ss_raw, nss = timed("substr_anchor", lambda: force(sub.substring_candidates(pages, cfg)[0]), t)
    ssv, nssv = timed("substr_verify", lambda: force(sub.verify_overlaps(ss_raw, pages, cfg)), t)
    print(f"  pairs: mh={nmh} sh={nsh} ex={nex} ss_raw={nss} ss_ver={nssv}", flush=True)

    pairs, npairs = timed(
        "union",
        lambda: force(
            cand.union_candidates(
                mh, sh, ex,
                ssv.select("url_a", "url_b").withColumn("method", F.lit("substring")),
            )
        ),
        t,
    )
    print(f"  union pairs={npairs}", flush=True)

    docs = pages.select("url", "text", "lang").join(
        sigs.select("url", "shingles", "mini", "simhash"), "url"
    )
    feats, _ = timed("features", lambda: force(compute_features(pairs, docs, cfg, ratios_for="mixed")), t)
    from webdedup.features import release_doc_caches

    release_doc_caches()  # features forced above; the doc cache is dead
    dec, _ = timed("decide", lambda: force(triage_rule(feats, cfg)), t)
    matches = dec.where(F.col("is_dup") == 1)
    comp = timed("cc", lambda: force(connected_components(matches.select("url_a", "url_b")))[0], t)
    timed(
        "assign",
        lambda: force(
            assign_clusters(pages.select("url", "warc_ts", "text", "lang"), comp).select("url", "gid")
        ),
        t,
    )
    total = round(sum(t.values()), 2)
    print(json.dumps({"cores": cores, "docs": n, "total": total, "stages": t}))


if __name__ == "__main__":
    main()
