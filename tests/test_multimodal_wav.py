"""Real audio decode path: the pure-Python WAV/PCM codec
(functions/wav_codec.py) and its DECODERS registration — the audio
twin of test_multimodal_png.py.

Load-bearing property: features come from SAMPLES, not payload bytes,
so two encodings of the same audio (different metadata chunks) collapse
to one near-dup cluster while the sha-stub would scatter them."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from flink_elasticsearch_ingestion_spark.functions.wav_codec import (
    WavFormatError,
    decode_wav,
    encode_wav,
    wav_energy_features,
)
from flink_elasticsearch_ingestion_spark.operators import multimodal as M
from flink_elasticsearch_ingestion_spark.operators import similarity as S


def _tone(freq=440.0, n=800, rate=8000, amp=12000, phase=0.0):
    return [
        int(amp * math.sin(2 * math.pi * freq * i / rate + phase))
        for i in range(n)
    ]


@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_pcm16(channels):
    samples = _tone() if channels == 1 else [
        v for pair in zip(_tone(), _tone(220.0)) for v in pair
    ]
    blob = encode_wav(samples, 8000, channels)
    rate, ch, out = decode_wav(blob)
    assert (rate, ch) == (8000, channels)
    assert out == samples


def test_metadata_variants_are_byte_different_but_feature_identical():
    samples = _tone()
    a = encode_wav(samples, 8000)
    b = encode_wav(samples, 8000, metadata=b"re-exported by toolchain v2")
    assert a != b
    assert hashlib.sha256(a).hexdigest() != hashlib.sha256(b).hexdigest()
    assert wav_energy_features(a) == wav_energy_features(b)
    other = encode_wav(_tone(freq=1760.0, amp=3000), 8000)
    fa, fo = wav_energy_features(a), wav_energy_features(other)
    assert fa != fo
    assert len(fa) == 9  # 8 RMS bands + zero-crossing rate
    assert all(0.0 <= v <= 1.0 for v in fa)


def test_malformed_payloads_fail_loudly():
    with pytest.raises(WavFormatError):
        decode_wav(b"not audio")
    blob = encode_wav(_tone())
    with pytest.raises(WavFormatError):
        decode_wav(blob[:30])
    with pytest.raises(WavFormatError):
        decode_wav(b"")


def test_registered_decoder_makes_audio_near_dup_perceptual(spark):
    """Arrow-batched extract_features + sign-LSH near-dup with the real
    WAV decoder: the two metadata-variant encodings of clip 0 pair up,
    the different clip stays unpaired."""
    samples = _tone()
    rows = [
        (0, "audio", bytearray(encode_wav(samples, 8000))),
        (1, "audio", bytearray(encode_wav(samples, 8000, metadata=b"v2"))),
        (2, "audio", bytearray(encode_wav(_tone(freq=1760.0, amp=3000), 8000))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(100).alias("duration_ms"),
        ),
    )
    stub = M.DECODERS["audio"]
    try:
        M.register_wav_decoder()
        feats = M.extract_features(media)
        vecs = feats.select(
            F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
        )
        pairs = S.embedding_near_duplicates(
            vecs, threshold=0.999, bits=2, tables=4
        ).collect()
        assert {(r["vec_a"], r["vec_b"]) for r in pairs} == {(0, 1)}
    finally:
        M.DECODERS["audio"] = stub
