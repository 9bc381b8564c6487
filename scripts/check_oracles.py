"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash (columns sorted by name,
doubles rounded)."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from webdedup.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if d[c].dtype == object:
            d[c] = d[c].astype(str)
        elif str(d[c].dtype).startswith("float"):
            d[c] = d[c].round(6)
    rows = sorted(
        "|".join(str(v) for v in rec) for rec in d.itertuples(index=False, name=None)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    spark = get_spark(app_name="oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf):7d} rows  ({t_spark:5.1f}s spark)")
            continue
        odf = con.execute(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        # normalize numeric dtypes for the hash
        h_s, h_o = value_hash(sdf), value_hash(odf)
        ok_hash = h_s == h_o
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status} rows {len(sdf)}/{len(odf)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({t_spark:5.1f}s spark)"
        )
        if not ok_hash and ok_rows and ok_cols:
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                av, bv = a[c].astype(str), b[c].astype(str)
                bad = (av != bv)
                if bad.any():
                    i = bad.idxmax()
                    print(f"    first diff col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}")
                    break
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    raise SystemExit(main(*(sys.argv[1:] or [])))
