"""Scale-ladder panel: time the heavy-query panel at one or more SF
fixture dirs and print per-query ratios + growth exponents.

Round 7 ran the sf1/sf3 sweeps ad hoc; this makes the ladder
reproducible. For each (query, sf_dir) the panel records min of two
back-to-back runs (the steady-state estimator bench.py uses), then for
consecutive dir pairs reports the wall-clock ratio and the growth
exponent  log(t_hi / t_lo) / log(rows_hi / rows_lo)  — an exponent of
1.0 is perfectly linear in data volume; the round-7 LSH bugs showed up
at 1.5+ long before they would have been visible in any plan audit.

Usage:
    python scripts/scale_panel.py                       # sf1 -> sf3 -> sf10
    python scripts/scale_panel.py .localdata/sf1 .localdata/sf10
    SPARK_GRAFT_PANEL="media_near_dup,minhash_near_dup" python scripts/scale_panel.py

Fixture dirs come from scripts/make_sf1.py
(SPARK_GRAFT_SF1_REPLICAS=10/30/100 -> .localdata/sf1/sf3/sf10).
Output: one JSON line per sf dir + a final ratio table, all also
written to scale_panel_out.json (committed artifacts quote it).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from flink_elasticsearch_ingestion_spark import get_spark  # noqa: E402

#: the 12-query heavy panel (SCALE.md "exponent check"): every family
#: with a candidate-generation or iteration term that COULD go
#: superlinear — LSH similarity x3, set similarity x2, substring/
#: minhash dedup x2, graph closure x1, sketches x2, composed
#: pipelines x2. Cheap scans are excluded on purpose: they are
#: overhead-bound at these sizes and only blur the exponent signal.
PANEL = [
    "label_disagreement",
    "embedding_dup_clusters",
    "media_near_dup",
    "substring_contamination",
    "minhash_near_dup",
    "containment_pairs",
    "token_set_join",
    "near_dup_clusters",
    "streaming_admission_replay",
    "bootstrap_ci",
    "join_size_estimate",
    "training_data_pipeline",
    # round-9 additions with a candidate/explode term worth watching:
    "mutual_matches",
    "margin_matches",
    "ngram_novelty",
    "minhash_band_stats",
    "saturating_dedup_rate",
    "source_kl_drift",
    "sessionize",
]


def _nrows(sf_dir: str) -> int:
    """lineitem row count from parquet footers — the ladder's x-axis."""
    import pyarrow.dataset as ds

    return ds.dataset(
        os.path.join(sf_dir, "lineitem.parquet"), format="parquet"
    ).count_rows()


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/repo/.localdata/sf1",
        "/root/repo/.localdata/sf3",
        "/root/repo/.localdata/sf10",
    ]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if len(dirs) < 1:
        raise SystemExit("no fixture dirs found; run scripts/make_sf1.py first")
    panel = [
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_PANEL", ",".join(PANEL)).split(",")
        if q.strip()
    ]
    spark = get_spark("scale-panel")
    queries = E.queries()
    # warmup (JVM, codegen, Arrow worker pool) on the smallest dir
    queries["pricing_summary"](spark, dirs[0]).count()
    spark.range(1000).mapInPandas(lambda it: (p for p in it), "id long").count()

    results: dict[str, dict] = {}
    for d in dirs:
        rows = _nrows(d)
        t: dict[str, float] = {}
        out_rows: dict[str, int] = {}
        for name in panel:
            fn = queries[name]
            t0 = time.perf_counter()
            n_out = fn(spark, d).count()
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, d).count()
            t[name] = round(min(first, time.perf_counter() - t0), 3)
            out_rows[name] = n_out
            spark.catalog.clearCache()
            print(
                f"{d.rsplit('/', 1)[-1]:>6} {name:<32} {t[name]:>8.2f}s"
                f"  ({n_out} rows)",
                flush=True,
            )
        spark._jvm.System.gc()
        results[d] = {"lineitem_rows": rows, "timings": t, "out_rows": out_rows}
        print(
            json.dumps(
                {
                    "sf_dir": d,
                    "lineitem_rows": rows,
                    "timings": t,
                    "out_rows": out_rows,
                }
            )
        )

    ladder = []
    for lo, hi in zip(dirs, dirs[1:]):
        scale = results[hi]["lineitem_rows"] / results[lo]["lineitem_rows"]
        step = {"from": lo, "to": hi, "data_ratio": round(scale, 2), "queries": {}}
        for name in panel:
            a, b = results[lo]["timings"][name], results[hi]["timings"][name]
            ratio = b / a if a > 0 else float("nan")
            # output-normalized exponent: for pair-emitting operators a
            # thresholded join's TRUE result can grow faster than the
            # input (duplication cliques, random low-dim features near
            # a loose threshold); time vs (input + output) separates
            # "the engine goes quadratic" from "the answer got bigger"
            o_lo = results[lo]["out_rows"][name] + results[lo]["lineitem_rows"]
            o_hi = results[hi]["out_rows"][name] + results[hi]["lineitem_rows"]
            work_scale = o_hi / o_lo if o_lo > 0 else scale
            step["queries"][name] = {
                "t_lo": a,
                "t_hi": b,
                "out_lo": results[lo]["out_rows"][name],
                "out_hi": results[hi]["out_rows"][name],
                "ratio": round(ratio, 2),
                "exponent": round(math.log(ratio) / math.log(scale), 2)
                if ratio > 0
                else None,
                "exponent_vs_work": round(
                    math.log(ratio) / math.log(work_scale), 2
                )
                if ratio > 0 and work_scale > 1
                else None,
            }
        ladder.append(step)

    out = {"panel": panel, "results": results, "ladder": ladder}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "scale_panel_out.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    for step in ladder:
        print(f"\n== {step['from']} -> {step['to']} (data x{step['data_ratio']}) ==")
        for name, row in sorted(
            step["queries"].items(), key=lambda kv: -(kv[1]["exponent"] or 0)
        ):
            flag = "  <-- SUPERLINEAR" if (row["exponent"] or 0) > 1.2 else ""
            print(
                f"{name:<32} {row['t_lo']:>8.2f}s -> {row['t_hi']:>8.2f}s"
                f"  x{row['ratio']:<6} exp {row['exponent']}"
                f" (vs work {row['exponent_vs_work']}){flag}"
            )


if __name__ == "__main__":
    main()
