"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in an ANSI-ON Spark session (the driver
uses its own session with Spark-4 defaults, NOT our permissive one) and
the matching ``oracle_sql()`` in DuckDB over the same parquet, then
compares: row count, schema (sorted column names), and values after
sorting columns by name and rows by all columns. Dtype mismatches are
reported because the driver's value hash is dtype-sensitive
(int64 vs float64 broke json_extract in round 1).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rows {len(spark_df)} vs {len(oracle_df)}")
        return problems
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(f"schema {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}")
        return problems
    s, o = canon(spark_df), canon(oracle_df)
    for c in s.columns:
        # r1 evidence says the driver hash is over STRINGIFIED values:
        # int32 vs int64 / ns vs us passed it, int64 vs float64 failed it.
        sv = s[c].map(lambda v: "<NA>" if pd.isna(v) else str(v)).to_numpy()
        ov = o[c].map(lambda v: "<NA>" if pd.isna(v) else str(v)).to_numpy()
        eq = sv == ov
        if not bool(np.all(eq)):
            bad = int(np.argmin(eq))
            problems.append(
                f"value[{c}] row{bad}: {sv[bad]!r} ({s[c].dtype}) vs {ov[bad]!r} ({o[c].dtype})"
            )
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    # mimic the driver: fresh session, Spark 4 defaults (ANSI ON), modest knobs
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("correctness-mimic")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = sorted(set(only or []) - set(qs))
    if unknown:
        # a typo'd name must NOT exit green having checked nothing
        print(f"FAIL unknown query name(s): {unknown} (known: {sorted(qs)[:5]}…)")
        spark.stop()
        sys.exit(2)
    n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"warn {name}: no oracle ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(sdf)} rows)")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
