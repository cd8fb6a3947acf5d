"""CLI entry point: the reference's ``-main`` (core.clj:102-112) rebuilt.

The reference's main had two launch-blocking bugs we fix by construction:
CLI args were parsed then discarded (``ParameterTool/fromMap
default-params`` instead of ``fromArgs``, core.clj:105-106), and the
job graph returned nil so ``.execute`` would NPE (core.clj:81-88).
Here the args ARE the config, unknown keys fail fast (from_flat), and
the pipeline is the tested batch/streaming copy.

Usage::

    python -m flink_elasticsearch_ingestion_spark \
        --conf source.checkpoint-offset="2024-01-15 00:00:00" \
        --source-path /root/testdata/sf0.001/events.parquet \
        --sink-path /tmp/out --checkpoint /tmp/ck.json [--streaming]

``--conf key=value`` accepts every ``source.*`` / ``sink.*`` key from
the reference's default-params map (core.clj:90-100).
"""

from __future__ import annotations

import argparse
import sys

from flink_elasticsearch_ingestion_spark.config import PipelineConfig
from flink_elasticsearch_ingestion_spark.session import get_spark
from flink_elasticsearch_ingestion_spark.sources.sinks import ParquetSink
from flink_elasticsearch_ingestion_spark.sources.tables import load_events
from flink_elasticsearch_ingestion_spark.streaming.shell import (
    CheckpointStore,
    run_incremental_batch,
    stream_copy,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="flink_elasticsearch_ingestion_spark")
    p.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="source.*/sink.* config (reference core.clj:90-100 keys)",
    )
    p.add_argument("--source-path", required=True, help="source parquet file/dir")
    p.add_argument("--sink-path", required=True, help="sink output dir")
    p.add_argument("--checkpoint", required=True, help="offset file (batch) / dir (streaming)")
    p.add_argument("--streaming", action="store_true", help="run as a Structured Stream")
    p.add_argument(
        "--sink-format",
        choices=("parquet", "es_bulk"),
        default="parquet",
        help="parquet (default) or es_bulk (/_bulk wire-format chunk files)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    flat = {}
    for item in args.conf:
        key, sep, value = item.partition("=")
        if not sep:
            raise SystemExit(f"--conf expects KEY=VALUE, got {item!r}")
        flat[key] = value
    cfg = PipelineConfig.from_flat(flat)  # unknown keys raise, not vanish

    spark = get_spark("copy-pipeline")
    if args.streaming:
        sink = ParquetSink(path=args.sink_path, mode="append")
        q = stream_copy(
            spark,
            args.source_path,
            sink,
            args.checkpoint,
            available_now=True,
            poll_interval_ms=cfg.source.poll_interval_ms,
        )
        q.awaitTermination()
        print("streaming copy drained")
        return 0

    sf_dir = args.source_path.rsplit("/", 1)[0]
    store = CheckpointStore(args.checkpoint)
    if cfg.source.checkpoint_offset and store.load() is None:
        store.save(cfg.source.checkpoint_offset)
    if args.sink_format == "es_bulk":
        from flink_elasticsearch_ingestion_spark.api import Engine

        n = Engine(sf_dir, spark=spark).copy_run_bulk(args.checkpoint, args.sink_path)
    else:
        events = load_events(spark, sf_dir)
        n = run_incremental_batch(
            events, ParquetSink(path=args.sink_path, mode="append"), store
        )
    print(f"copied {n} documents; checkpoint -> {store.load()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
