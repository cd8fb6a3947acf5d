"""Pure-Python WAV/PCM codec — the REAL audio decoder for the
multimodal ``DECODERS`` seam (operators/multimodal.py), stdlib-only
(``struct``), companion to the PNG image codec (png_codec.py).

Scope: RIFF/WAVE containers with 16-bit PCM (format tag 1), mono or
multi-channel, any sample rate; unknown chunks (LIST/INFO metadata,
padding) are skipped per the RIFF spec — which is exactly what makes
the perceptual property real: two files with identical samples but
different metadata chunks are byte-different yet decode identically.

Used per-row inside Arrow-batched ``mapInPandas`` workers — no Spark
imports; cheap to pickle to executors.
"""

from __future__ import annotations

import math
import struct


class WavFormatError(ValueError):
    pass


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode to ``(sample_rate, n_channels, samples)`` with samples
    interleaved signed 16-bit ints."""
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavFormatError("truncated chunk")
        if cid == b"fmt ":
            tag, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if tag != 1 or bits != 16:
                raise WavFormatError(
                    f"only 16-bit PCM supported (tag={tag}, bits={bits})"
                )
            fmt = (rate, channels)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavFormatError("missing fmt/data chunk")
    if len(data) % 2:
        raise WavFormatError("odd PCM16 data length")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return fmt[0], fmt[1], samples


def encode_wav(
    samples: list[int],
    sample_rate: int = 16_000,
    channels: int = 1,
    *,
    metadata: bytes | None = None,
) -> bytes:
    """Encode interleaved signed 16-bit samples. ``metadata`` (if any)
    lands in a LIST/INFO chunk BEFORE the data chunk — same audio,
    different bytes: the perceptual-dedup fixture knob."""
    if len(samples) % channels:
        raise WavFormatError("sample count not divisible by channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if metadata is not None:
        info = b"INFO" + b"ICMT" + struct.pack("<I", len(metadata)) + metadata
        if len(metadata) & 1:
            info += b"\x00"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_energy_features(
    payload: bytes, kind: str = "audio", bands: int = 8
) -> list[float]:
    """Perceptual audio features: ``bands`` temporal RMS energies
    (mono-mixed, normalized to [0, 1]) plus the zero-crossing rate —
    byte-different encodings of the same samples produce IDENTICAL
    features. Signature matches the ``DECODERS`` contract."""
    _, channels, samples = decode_wav(payload)
    if channels > 1:  # mix down deterministically
        frames = len(samples) // channels
        samples = [
            sum(samples[i * channels : (i + 1) * channels]) // channels
            for i in range(frames)
        ]
    n = len(samples)
    if n == 0:
        return [0.0] * (bands + 1)
    feats = []
    for b in range(bands):
        lo = b * n // bands
        hi = max((b + 1) * n // bands, lo + 1)
        window = samples[lo:hi]
        rms = math.sqrt(sum(s * s for s in window) / len(window))
        feats.append(rms / 32768.0)
    crossings = sum(
        1 for a, b2 in zip(samples, samples[1:]) if (a >= 0) != (b2 >= 0)
    )
    feats.append(crossings / max(n - 1, 1))
    return feats
