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
    # TYPE-STRICT on purpose (round-2 lesson): the driver's value hash
    # distinguishes int 123 from float 123.0 (DuckDB HUGEINT -> pandas
    # float64), so the local gate must too.  Each scalar is tagged with
    # its type class; a value that is integer-typed on one side and
    # float-typed on the other can never compare equal here.
    import datetime
    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (np.floating, float)):
        return f"f:{float(v):.9g}"
    if isinstance(v, (np.integer, int)):
        return f"i:{int(v)}"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


# DuckDB types that pandas renders as float64 (or object) and the
# driver's hash will therefore never match a Spark integer column.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "INT128", "UHUGEINT")


def describe_scan(con, name: str, sql: str) -> list[str]:
    """Return the oracle's forbidden-typed columns (HUGEINT family)."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return []  # the main run will surface the real error
    return [
        f"{cname}:{ctype}"
        for cname, ctype, *_ in desc
        if any(t in str(ctype).upper() for t in _FORBIDDEN_ORACLE_TYPES)
    ]


def _dtype_class_mismatch(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype *kind* differs between the frames.

    int vs float is a driver-visible hash mismatch even when values are
    numerically equal, so flag it here.  Object columns are exempt (the
    per-value tag in _norm_val covers those).
    """
    out = []
    for c in set(a.columns) & set(b.columns):
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        num = {"i": "int", "u": "int", "f": "float"}
        if ka in num or kb in num:
            if num.get(ka) != num.get(kb):
                # all-null float columns are pandas' encoding of nullable
                # ints; only complain when real values exist on both sides
                if a[c].notna().any() and b[c].notna().any():
                    out.append(f"{c}: spark={a[c].dtype} duck={b[c].dtype}")
    return out


def _vanilla_spark():
    """The driver replica: a bare builder with NONE of the engine's
    session conf (stock shuffle partitions, filter pushdown off, no
    timezone pin).  Catalog queries must be green here too — round 3's
    only red row was an engine-conf dependence this mode now catches
    before the driver does."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-check-vanilla")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"
    return spark


def dupescan() -> int:
    """Semantic-duplicate guard (VERDICT r10 "What's wrong #3"): run
    EVERY catalog query at sf0.001, hash the normalized result, and
    report name pairs with identical hashes as candidate duplicates.
    Intentional twins (a pinned alternate execution strategy over the
    same semantics) live in plans/allowlists.SEMANTIC_TWINS with a
    justification; anything else colliding is the round-9 incident
    class (3 shipped duplicates caught only by hand) and fails the
    scan.  0-row results are reported informationally, not failed —
    distinct queries can both be legitimately empty at sf0.001."""
    import hashlib
    import itertools

    from flink_elasticsearch_ingestion_spark.plans.allowlists import (
        SEMANTIC_TWINS,
    )

    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark("oracle-dupescan")
    hashes: dict[str, list[str]] = {}
    empties: list[str] = []
    for name, fn in E.queries().items():
        try:
            pdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception:
            print(f"ERROR {name}: query failed at sf0.001")
            traceback.print_exc()
            return 1
        if len(pdf) == 0:
            empties.append(name)
            continue
        digest = hashlib.sha256(
            ("|".join(pdf.columns) + "\n" + pdf.to_csv(index=False)).encode()
        ).hexdigest()
        hashes.setdefault(digest, []).append(name)
        print(f"scan  {name}: {len(pdf)} rows {digest[:12]}")
    if empties:
        print(f"\nempty at sf0.001 (not compared): {sorted(empties)}")
    bad = []
    for names in hashes.values():
        # pairwise: a 3-way collision group needs every pair justified
        uncovered = [
            sorted(p)
            for p in itertools.combinations(sorted(names), 2)
            if frozenset(p) not in SEMANTIC_TWINS
        ]
        bad.extend(uncovered)
    if bad:
        print(f"\nCANDIDATE DUPLICATES (identical sf0.001 result hash): {bad}")
        print("remove the duplicate or justify it in plans/allowlists.SEMANTIC_TWINS")
        return 1
    print("\nno unexplained result-hash collisions")
    return 0


def main():
    args = sys.argv[1:]
    window_n = None
    vanilla = False
    if "--dupescan" in args:
        sys.exit(dupescan())
    if "--vanilla" in args:
        vanilla = True
        args.remove("--vanilla")
    for a in list(args):
        if a.startswith("--window="):
            # simulate the driver's bounded check window: first N
            # entries of queries() only
            window_n = int(a.split("=", 1)[1])
            args.remove(a)
    only = set(args)
    spark = _vanilla_spark() if vanilla else get_spark("oracle-check")
    con = duck_con()
    qs = E.queries()
    if window_n is not None:
        qs = dict(list(qs.items())[:window_n])
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
        bad_types = describe_scan(con, name, oracles[name])
        if bad_types:
            problems.append(f"oracle emits HUGEINT-family columns {bad_types} (wrap in CAST(... AS BIGINT))")
        dtype_mismatch = _dtype_class_mismatch(spark_pd, duck_pd)
        if dtype_mismatch:
            problems.append(f"dtype class mismatch {dtype_mismatch}")
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
