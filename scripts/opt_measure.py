"""Round-11/12 optimization measurement helper (guide §1).

For each named query: min-of-N timing with the bench's .count() action
(comparability with bench.py) PLUS a noop-sink timing (guide §1.4 — the
computation without column pruning), and the .explain("formatted") plan
written to plans/<dir>/<name>_<tag>.txt (--plans=r12 by default).

--executed additionally captures the POST-EXECUTION formatted plan
(the AQE final plan, isFinalPlan=true — VERDICT r11 #7: claims that
depend on runtime exchange reuse / cache hits must cite the executed
plan, not the static one) to <name>_<tag>_executed.txt.

Usage:
  python scripts/opt_measure.py [--sf=/root/testdata/sf0.1] [--n=3] \
      [--tag=before] [--plans=r12] [--explain-only] [--executed] \
      query [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from flink_elasticsearch_ingestion_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n, tag, explain_only, noop = 3, "before", False, False
    executed, plans_dir = False, "r12"
    names = []
    for a in args:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a == "--explain-only":
            explain_only = True
        elif a == "--noop":
            noop = True
        elif a == "--executed":
            executed = True
        elif a.startswith("--plans="):
            plans_dir = a.split("=", 1)[1]
        else:
            names.append(a)
    spark = get_spark("opt-measure")
    qs = E.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        plans_dir,
    )
    os.makedirs(out_dir, exist_ok=True)

    # warmup (same as bench.py): JVM, codegen, parquet footers, Python
    # worker pool
    if not explain_only:
        qs["pricing_summary"](spark, sf_dir).count()
        spark.range(1000).mapInPandas(
            lambda it: (pdf for pdf in it), "id long"
        ).count()

    results = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        if executed:
            # run the bench action on the SAME DataFrame object, then
            # re-explain: with AQE the plan now shows the final
            # re-optimized form (ReusedExchange, InMemoryTableScan,
            # AQEShuffleRead) instead of isFinalPlan=false
            edf = fn(spark, sf_dir)
            edf.count()
            buf = io.StringIO()
            with redirect_stdout(buf):
                edf.explain("formatted")
            with open(
                os.path.join(out_dir, f"{name}_{tag}_executed.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        if explain_only:
            print(f"plan  {name} -> plans/{plans_dir}/{name}_{tag}.txt")
            continue
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        entry = {"count_min": min(samples), "count_samples": samples}
        if noop:
            nsamples = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                nsamples.append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
            entry["noop_min"] = min(nsamples)
            entry["noop_samples"] = nsamples
        results[name] = entry
        print(f"time  {name}: {json.dumps(entry)}")
        spark.sparkContext.setJobDescription(None)
    if results:
        print(json.dumps({"sf_dir": sf_dir, "tag": tag, "results": results}))


if __name__ == "__main__":
    main()
