"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() in DuckDB at sf0.01, compare row count, schema
(column names sorted), and values (rounded doubles, sorted rows).

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from webdedup.session import get_spark

    spark = get_spark(app_name="correctness-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = em.queries(), em.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"{name}: SPARK ERROR {exc}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"{name}: SCHEMA MISMATCH")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"{name}: ROW MISMATCH {len(sdf)} vs {len(odf)}")
            continue
        s, o = _canon(sdf), _canon(odf)
        try:
            o = o.astype(s.dtypes.to_dict())
        except (TypeError, ValueError):
            pass
        ok = True
        for c in s.columns:
            if s[c].dtype.kind == "f":
                col_ok = all(
                    (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9
                    for a, b in zip(s[c].fillna(float("nan")), o[c].fillna(float("nan")))
                )
            else:
                col_ok = s[c].equals(o[c])
            if not col_ok:
                ok = False
                break
        if ok:
            print(f"{name}: OK ({len(sdf)} rows)")
        else:
            failures.append((name, f"value mismatch in {c}"))
            print(f"{name}: VALUE MISMATCH in {c}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} green")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
