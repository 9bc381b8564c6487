"""dedup_tier_counts: every tier must fire and match the DuckDB oracle on
a hand-planted corpus (the driver's sf0.01 table has no exact dups and no
sub-0.5-jaccard substring pairs, so this is where those arms get coverage).
"""

from __future__ import annotations

import duckdb
import pytest


def _mk_docs():
    filler_a = " ".join(f"alpha{i:03d}" for i in range(60))
    filler_b = " ".join(f"beta{i:03d}" for i in range(60))
    shared = " ".join(f"shared{i:03d}" for i in range(40))  # ~400 chars
    assert len(shared) >= 300

    near_a = "the quick brown fox jumps over one lazy dog near the old stone bridge today"
    near_b = "the quick brown fox jumps over two lazy dog near the old stone bridge today"
    exact = "identical boilerplate text repeated verbatim across mirror pages again"

    docs = [
        (0, exact, "en"),
        (1, exact, "en"),
        (2, exact, "en"),  # exact tier: sum(3-1) = 2 star pairs
        (3, near_a, "en"),
        (4, near_b, "en"),  # near tier: 1 pair (jacc ~0.77, texts differ)
        (5, f"{filler_a} {shared}", "en"),
        (6, f"{shared} {filler_b}", "en"),  # substring tier: 1 pair (jacc < 0.5)
        (7, "a lone unrelated document about completely different topics", "en"),
    ]
    # sanity: the substring pair's bigram jaccard really is < 0.5
    sa = set(zip(docs[5][1].split(), docs[5][1].split()[1:]))
    sb = set(zip(docs[6][1].split(), docs[6][1].split()[1:]))
    assert len(sa & sb) / len(sa | sb) < 0.5
    return docs


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiers"))
    spark.createDataFrame(
        _mk_docs(), "doc_id bigint, text string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_all_tiers_fire_and_match_oracle(spark, docs_dir):
    import __spark_entry__ as em

    got = {
        r["tier"]: r["n_pairs"]
        for r in em.queries()["dedup_tier_counts"](spark, docs_dir).collect()
    }
    assert got == {
        "exact": 2,
        "near": 1,
        "substring": 1,
        "candidates_dropped": 0,  # the capped-mass audit row (0 = no caps hit)
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    oracle = dict(con.execute(em.oracle_sql()["dedup_tier_counts"]).fetchall())
    assert got == oracle
