"""Catalog queries must be self-contained w.r.t. session conf.

The driver hash-checks ``queries()`` under a VANILLA SparkSession —
none of the engine's ``get_spark`` settings are present there.  Round
3's only red row (`es_scroll_roundtrip`) was exactly this class of bug:
the reader defined ``pushFilters`` while the driver session ran
``spark.sql.python.filterPushdown.enabled=false``, which Spark treats
as a hard error, not a soft skip.

Two simulation layers:

- ``newSession()`` clones for conf-independence of plain queries (fast,
  same JVM).  NOT usable for Python data sources: a session cloned
  after the parent registered one reports DATA_SOURCE_ALREADY_EXISTS on
  register yet DATA_SOURCE_NOT_FOUND on load (Spark quirk, verified) —
  and the real driver is a fresh process anyway.
- a SUBPROCESS with a bare ``SparkSession.builder.getOrCreate()`` (no
  engine conf at all) for the connector round-trips — the faithful
  driver replica.
"""

import json
import os
import subprocess
import sys

import pytest

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROC_SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# The bare builder: exactly what the correctness driver runs — no
# engine conf, filter pushdown at its default (false).
spark = (SparkSession.builder.master("local[8]").appName("vanilla")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "false"

import __spark_entry__ as E
out = {{}}
for name in {names!r}:
    df = E.queries()[name](spark, {sf_dir!r})
    rows = sorted(map(lambda r: tuple(map(str, r)), df.collect()))
    out[name] = [len(rows), hash(tuple(rows)) & 0xFFFFFFFF]
print("RESULT:" + json.dumps(out))
"""

_CONNECTOR_QUERIES = ["es_scroll_roundtrip", "es_bulk_roundtrip"]


@pytest.fixture(scope="module")
def vanilla_results(sf_dir):
    env = dict(os.environ, PYTHONHASHSEED="0")
    script = _SUBPROC_SCRIPT.format(
        repo=REPO, names=_CONNECTOR_QUERIES, sf_dir=sf_dir
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"vanilla-session run failed:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:"):])


def _engine_fingerprint(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    rows = sorted(map(lambda r: tuple(map(str, r)), df.collect()))
    return [len(rows), None]  # hash differs across processes; compare counts


@pytest.mark.parametrize("name", _CONNECTOR_QUERIES)
def test_connector_roundtrips_green_under_bare_driver_session(
    spark, sf_dir, name, vanilla_results
):
    """The r3 driver red cannot recur: both connector round-trips run
    to completion under a truly vanilla session (fresh process, default
    conf, pushdown disabled) and produce the same row count as the
    engine session."""
    want_n, _ = _engine_fingerprint(spark, sf_dir, name)
    got_n, _ = vanilla_results[name]
    assert got_n == want_n
    assert got_n > 0


def _vanilla_clone(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    return ns


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "name",
    [
        # ts-range + timezone-sensitive casts (the scariest conf class)
        "copy_incremental",
        "tumbling_windows",
        "resample_events",
        # bloom-filter session conf must not be semantics-bearing
        "bloom_prefilter_join",
        # window/decimal heavy
        "trailing_revenue_window",
        # portable-hash dedup family
        "minhash_near_dup",
    ],
)
def test_representative_queries_conf_independent(spark, sf_dir, name):
    q = E.queries()[name]
    got = _rows(q(_vanilla_clone(spark), sf_dir))
    want = _rows(q(spark, sf_dir))
    assert got == want
    assert len(got) > 0
