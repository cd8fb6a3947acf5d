"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from flink_elasticsearch_ingestion_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def duck_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        out[c] = s.map(lambda v: _norm_val(v))
    nd = pd.DataFrame(out)
    return nd.sort_values(by=list(nd.columns)).reset_index(drop=True)


def _norm_val(v):
    import datetime
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, (np.floating, float)):
        return f"{float(v):.9g}"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duck_con()
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_pd)} rows (rows-only check)")
            if len(spark_pd) == 0 and name != "embedding_near_dup":
                print(f"  WARNING: 0 rows")
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            problems.append(f"cols spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}")
        if not problems:
            a, b = normalize(spark_pd), normalize(duck_pd)
            if not a.equals(b):
                neq = (a != b).any(axis=1)
                diff_rows = a[neq].head(3), b[neq].head(3)
                problems.append(f"values differ on {int(neq.sum())} rows\nspark:\n{diff_rows[0]}\nduck:\n{diff_rows[1]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name} ({len(spark_pd)} rows)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
