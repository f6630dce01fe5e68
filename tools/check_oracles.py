"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(4)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype(str)
        elif col.dtype == object:
            df[c] = col.map(lambda x: str(x) if x is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from legal_ner_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo must not make the gate pass vacuously
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            continue
        a, b = norm_frame(sdf), norm_frame(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
        elif not a.astype(str).equals(b.astype(str)):
            neq = (a.astype(str) != b.astype(str)).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} rows differ; first:")
            print(pd.concat([a[neq].head(3), b[neq].head(3)],
                            keys=["spark", "duck"]))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(a)} rows")
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
