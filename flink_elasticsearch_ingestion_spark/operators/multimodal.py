"""Multimodal column plumbing (north-star ext).

Images/audio/video travel as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing (schema, Arrow-batched UDF
signatures, partition-aware batch shapes) is real and tested; the
actual codec work is stubbed — the container ships no image/audio
libraries — behind ``DECODERS`` so a real decoder drops in without
touching the engine.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + metadata struct prunes independently); feature extraction is
``mapInPandas`` so payload bytes stream through Arrow record batches
instead of being collected; per-batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        # double, not float: the decode registry returns Python doubles
        # and a float32 round-trip would corrupt the 6th decimal the
        # cross-engine feature parity check compares on
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats derived from
    the payload digest. Replace via DECODERS[kind]."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def _real_decode(payload: bytes, kind: str) -> list[float]:  # pragma: no cover
    raise NotImplementedError(
        "real image/audio/video decoding needs codec libraries not present "
        "in this container; register one in DECODERS"
    )


#: pluggable decode registry; swap _fake_decode for a real codec per kind
DECODERS: dict[str, object] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def png_decoder(grid: int = 8):
    """The REAL pure-Python PNG decode callable (functions/png_codec.py:
    stdlib zlib inflate + full filter unfiltering + aHash pooling),
    suitable for ``DECODERS['image']`` or an ``extract_features(...,
    decoders=)`` override. Two byte-different re-encodes of the same
    pixels produce IDENTICAL features, so media near-dup is perceptual,
    not payload-hash equality."""
    from flink_elasticsearch_ingestion_spark.functions.png_codec import (
        png_ahash_features,
    )

    return lambda payload, kind: png_ahash_features(payload, kind, grid=grid)


def wav_decoder(bands: int = 8):
    """Audio twin of :func:`png_decoder`: the pure-Python WAV/PCM decode
    callable (functions/wav_codec.py — RIFF chunk walk + temporal RMS
    bands + zero-crossing rate)."""
    from flink_elasticsearch_ingestion_spark.functions.wav_codec import (
        wav_energy_features,
    )

    return lambda payload, kind: wav_energy_features(payload, kind, bands=bands)


def register_png_decoder(grid: int = 8) -> None:
    """Swap the stub image decoder for the real PNG codec process-wide.

    Opt-in (not the default) because the catalog's hash-verified media
    queries pin the sha-derived stub as their DuckDB-rederivable
    oracle; deployments whose image payloads are PNGs call this once
    at startup. Scoped use (a single query against real PNGs while the
    rest of the session keeps the stub) should pass
    ``extract_features(..., decoders={**DECODERS, 'image':
    png_decoder()})`` instead of mutating this registry. Perceptual
    behavior is pinned by tests/test_multimodal_png.py."""
    DECODERS["image"] = png_decoder(grid)


def register_wav_decoder(bands: int = 8) -> None:
    """Audio twin of :func:`register_png_decoder`. Same opt-in
    contract: the sha stub stays the default oracle path; perceptual
    behavior is pinned by tests/test_multimodal_wav.py."""
    DECODERS["audio"] = wav_decoder(bands)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for the test fixtures: treat document text bytes as an
    opaque payload so the multimodal plumbing is exercised end-to-end
    on real data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decoders: dict | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoders``: optional per-call decode registry (kind -> callable),
    captured by value into the task closure. Passing it scopes a real
    codec to THIS query without mutating the process-global ``DECODERS``
    dict — concurrent sibling queries in the same session keep seeing
    the registry they expect. None (the default) reads ``DECODERS`` at
    execution time, preserving the register-once-at-startup contract."""
    fixed = dict(decoders) if decoders is not None else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = fixed if fixed is not None else DECODERS
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_sha": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": [
                        decode[k](p, k) for k, p in zip(pdf["kind"], pdf["payload"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: a real implementation
    decodes, resamples to (width, height), re-encodes. The stub keeps
    the transform deterministic and size-bounded so the Spark plumbing
    (binary in -> binary out, meta rewrite) is testable without codecs."""
    cap = max(width * height, 1)
    return (payload or b"")[:cap]


RESIZERS: dict[str, object] = {"image": _fake_resize}


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched resize over image payloads: binary in, binary out,
    metadata struct rewritten to the new dimensions. Non-image rows pass
    through untouched. Output schema == input schema, so resize stages
    compose/pipeline freely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized_payload = []
            resized_meta = []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind in RESIZERS:
                    resized_payload.append(RESIZERS[kind](payload, width, height))
                    new_meta = dict(meta) if meta is not None else {}
                    new_meta["width"] = width
                    new_meta["height"] = height
                    resized_meta.append(new_meta)
                else:
                    resized_payload.append(payload)
                    resized_meta.append(meta)
            out["payload"] = resized_payload
            out["meta"] = resized_meta
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256, stride: int = 4) -> DataFrame:
    """Frame sampling: one input row fans out to N frame rows (a real
    implementation seeks the container every ``stride`` frames; the stub
    slices the payload into deterministic ``frame_bytes`` chunks and
    keeps every ``stride``-th). mapInPandas yields more rows than it
    consumes — the UDTF-shaped fan-out — while Arrow keeps the payload
    bytes off the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                chunks = [
                    payload[off : off + frame_bytes]
                    for off in range(0, len(payload), frame_bytes)
                ]
                for i, chunk in enumerate(chunks[::stride]):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Declarative metadata profile — no decode, no Python: payload
    sizes and hashes via built-ins only."""
    return (
        media.select(
            "kind",
            F.length("payload").alias("n_bytes"),
            F.sha2("payload", 256).alias("content_sha"),
        )
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_sha").alias("n_distinct"),
        )
        .orderBy("kind")
    )


def sha_features_expr(media: DataFrame) -> DataFrame:
    """PURE-JVM twin of :func:`extract_features` for the sha-derived
    stub decoder: feature_i = digest_byte_i / 255.0 computed as
    ``sha2`` + ``substring``/``conv`` expressions — no Python workers,
    whole-stage codegen end-to-end ("built-ins first").  Exact parity
    with the Arrow path is unit-pinned; a REAL codec cannot take this
    route (decoding needs Python), so ``extract_features`` remains the
    production seam and this twin is the fast path while the decoder
    is the deterministic stub."""
    sha = F.sha2(F.col("payload"), 256)
    feats = F.array(
        *[
            (
                F.conv(F.substring(sha, i * 2 + 1, 2), 16, 10).cast("double")
                / F.lit(255.0)
            )
            for i in range(8)
        ]
    )
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("int").alias("n_bytes"),
        sha.alias("content_sha"),
        feats.alias("feature"),
    )
