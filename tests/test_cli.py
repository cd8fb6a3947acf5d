"""The ``python -m flink_elasticsearch_ingestion_spark`` entry point —
the reference's ``-main`` (core.clj:102-112) — exercised end-to-end
in-process. The reference's main was launch-blocking-buggy (args parsed
then discarded; nil job graph); these tests pin that OUR main actually
consumes its args, honors the reference's config keys, advances the
checkpoint, and is idempotent across re-runs."""

import json
import os

import pytest

from flink_elasticsearch_ingestion_spark.__main__ import build_parser, main


def test_unknown_conf_keys_fail_fast():
    """The reference dropped CLI params silently (fromMap instead of
    fromArgs); ours must reject typos loudly instead."""
    with pytest.raises((SystemExit, KeyError)):
        main(
            [
                "--conf",
                "source.elasticsearch-ur=http://x:9200",  # typo'd key
                "--source-path",
                "/tmp/x",
                "--sink-path",
                "/tmp/y",
                "--checkpoint",
                "/tmp/ck",
            ]
        )
    with pytest.raises(SystemExit):
        main(
            [
                "--conf",
                "not-a-pair",
                "--source-path",
                "/tmp/x",
                "--sink-path",
                "/tmp/y",
                "--checkpoint",
                "/tmp/ck",
            ]
        )


def test_batch_copy_runs_and_advances_checkpoint(tmp_path, spark, sf_dir):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck.json")
    rc = main(
        [
            "--conf",
            "source.checkpoint-offset=2024-01-15 00:00:00",
            "--source-path",
            f"{sf_dir}/events.parquet",
            "--sink-path",
            out,
            "--checkpoint",
            ck,
        ]
    )
    assert rc == 0
    copied = spark.read.parquet(out)
    assert copied.count() > 0
    assert set(copied.columns) >= {"doc_id", "index_id", "ts"}
    # checkpoint advanced beyond the configured offset
    saved = json.load(open(ck))
    assert str(saved) > "2024-01-15"
    # re-run from the advanced checkpoint: nothing new to copy, sink
    # row count unchanged (idempotent incremental semantics)
    before = copied.count()
    rc = main(
        [
            "--source-path",
            f"{sf_dir}/events.parquet",
            "--sink-path",
            out,
            "--checkpoint",
            ck,
        ]
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == before


def test_bulk_sink_format_writes_wire_chunks(tmp_path, sf_dir):
    out = str(tmp_path / "bulk")
    ck = str(tmp_path / "ck.json")
    rc = main(
        [
            "--conf",
            "source.checkpoint-offset=2024-01-20 00:00:00",
            "--source-path",
            f"{sf_dir}/events.parquet",
            "--sink-path",
            out,
            "--checkpoint",
            ck,
            "--sink-format",
            "es_bulk",
        ]
    )
    assert rc == 0
    files = [f for _, _, fs in os.walk(out) for f in fs]
    assert files, "es_bulk sink wrote nothing"


def test_parser_accepts_reference_config_keys():
    p = build_parser()
    args = p.parse_args(
        [
            "--conf",
            "sink.elasticsearch-url=http://localhost:9200",
            "--conf",
            "sink.elasticsearch-username=elastic",
            "--source-path",
            "s",
            "--sink-path",
            "o",
            "--checkpoint",
            "c",
        ]
    )
    assert len(args.conf) == 2
