"""Per-poll flatness soak for the streaming ingestion capstone
(VERDICT r8 #6): drive ``stream_scroll_ingest_pipeline`` for N polls at
sf0.1 — each poll stages a fresh slice of documents into the scroll
index and runs one availableNow epoch against the SAME work dir and
checkpoint, so the admission store grows poll over poll exactly like
production. Records per-poll wall seconds; round 7's localCheckpoint
fix predicts a ~flat series (the per-poll cost is the new slice's
signatures + ONE band join against the persisted store, not a re-read
of history).

Usage: python scripts/stream_soak.py [n_polls] [sf_dir]
Prints one JSON line: {"polls": [...], "slope_s_per_poll": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from flink_elasticsearch_ingestion_spark import get_spark  # noqa: E402
from flink_elasticsearch_ingestion_spark.sources.es_scroll import (  # noqa: E402
    write_index_shards,
)
from flink_elasticsearch_ingestion_spark.sources.tables import load_table  # noqa: E402
from flink_elasticsearch_ingestion_spark.streaming.pipeline import (  # noqa: E402
    read_monitor_log,
    stream_scroll_ingest_pipeline,
)


def main() -> None:
    n_polls = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("stream-soak", shuffle_partitions=32)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_id"),
            F.col("lang").alias("index_id"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
            F.col("text").alias("source"),
            (F.col("doc_id") % n_polls).alias("slice"),
        )
        .persist()
    )
    n_total = docs.count()
    root = tempfile.mkdtemp(prefix="stream_soak_")
    idx = os.path.join(root, "index")
    work = os.path.join(root, "work")
    polls = []
    try:
        for p in range(n_polls):
            batch = docs.filter(F.col("slice") == p).drop("slice")
            if p == 0:
                write_index_shards(batch, idx, n_shards=2)
            else:
                # the scroll offset is LINES CONSUMED PER SHARD: later
                # polls append JSONL lines to the existing shard files
                # (continuous indexing), exactly the shape the source's
                # incremental contract expects
                rows = batch.collect()
                shards = sorted(
                    f for f in os.listdir(idx) if f.startswith("shard-")
                )
                handles = [
                    open(os.path.join(idx, s), "a", encoding="utf-8")
                    for s in shards
                ]
                for i, r in enumerate(rows):
                    handles[i % len(handles)].write(
                        json.dumps(
                            {
                                "doc_id": r["doc_id"],
                                "index_id": r["index_id"],
                                "ts": "2024-01-01T00:00:00.000000",
                                "source": r["source"],
                            }
                        )
                        + "\n"
                    )
                for h in handles:
                    h.close()
            t0 = time.monotonic()
            q = stream_scroll_ingest_pipeline(spark, idx, work)
            q.awaitTermination(600)
            polls.append(round(time.monotonic() - t0, 2))
            print(f"  poll {p}: {polls[-1]}s", file=sys.stderr)
        mon = read_monitor_log(spark, work).orderBy("epoch").collect()
        admitted = sum(r["n_admitted"] for r in mon)
        # least-squares slope over poll index -> seconds
        n = len(polls)
        xm = (n - 1) / 2
        ym = sum(polls) / n
        slope = sum((i - xm) * (y - ym) for i, y in enumerate(polls)) / sum(
            (i - xm) ** 2 for i in range(n)
        )
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_polls": n,
                    "n_docs": n_total,
                    "n_admitted_total": admitted,
                    "polls_s": polls,
                    "mean_s": round(ym, 2),
                    "slope_s_per_poll": round(slope, 4),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
