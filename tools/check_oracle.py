"""Local simulation of the driver's correctness gate.

Runs every __spark_entry__ queries() entry on Spark AND its oracle_sql()
twin on DuckDB at the given sf dir, then compares row count, schema
(column names) and an order-insensitive value hash — mirroring
CORRECTNESS_r{N}.json. Usage:

    python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(None if pd.isna(v) else (round(v, 9) if isinstance(v, float) else v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


def main(sf_dir: str) -> int:
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entry_mod.queries()
    only = os.environ.get("CHECK_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):6d} (rows-only, no oracle) {t_spark:5.1f}s")
            continue
        t0 = time.time()
        odf = con.execute(oracles[name]).df()
        t_duck = time.time() - t0
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status} rows={len(sdf):6d}/{len(odf):6d} "
            f"cols_ok={ok_cols} hash_ok={ok_hash} spark={t_spark:5.1f}s duck={t_duck:4.1f}s"
        )
        if status == "FAIL":
            failures += 1
            if ok_cols and ok_rows:
                s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
                diff = (s != o) & ~(s.isna() & o.isna())
                bad = diff.any(axis=1)
                print("  first diffs (spark vs duckdb):")
                print(pd.concat([s[bad].head(3), o[bad].head(3)], axis=1).to_string())
            else:
                print("  spark cols:", list(sdf.columns), "duck cols:", list(odf.columns))
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf) else 0)
