"""Pure-Python PNG codec — a REAL image decoder for the multimodal
``DECODERS`` seam (operators/multimodal.py), built only on stdlib
``zlib``/``struct`` since the container ships no imaging libraries.

Scope: non-interlaced, 8-bit-depth PNGs in grayscale (color type 0),
RGB (2), gray+alpha (4), and RGBA (6), with full support for all five
scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9). That covers
everything this engine's own ``encode_png`` produces plus the common
output of mainstream encoders at bit depth 8.

Why it matters: the stub decoder derives features from the payload
sha256, so two encodings of the SAME pixels (different compression
level or filter choice) look maximally different. ``png_features``
decodes to pixels first, so re-encodes collapse to identical features
and perceptual near-dup becomes real (pinned in
tests/test_multimodal_png.py).

Used per-row inside Arrow-batched ``mapInPandas`` workers — no Spark
imports here; the module must stay cheap to pickle to executors.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: channels per color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    pass


def _chunks(payload: bytes):
    pos = len(_SIGNATURE)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngFormatError("truncated chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise PngFormatError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Decode to ``(width, height, channels, pixels)`` with ``pixels``
    a row-major bytearray of ``width*height*channels`` samples."""
    if not payload or not payload.startswith(_SIGNATURE):
        raise PngFormatError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngFormatError("interlaced PNGs unsupported")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise PngFormatError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev_row = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                ul = prev_row[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev_row[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev_row = row
    return width, height, channels, out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes | bytearray,
    width: int,
    height: int,
    channels: int = 3,
    *,
    level: int = 6,
    filter_type: int = 0,
) -> bytes:
    """Encode row-major 8-bit samples. ``level``/``filter_type`` exist
    so tests can produce byte-DIFFERENT encodings of pixel-IDENTICAL
    images (the perceptual-dedup fixture)."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngFormatError("pixel buffer does not match dimensions")
    raw = bytearray()
    prev_row = bytearray(stride)
    for y in range(height):
        row = bytearray(pixels[y * stride : (y + 1) * stride])
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:  # Up
            raw += bytes((row[i] - prev_row[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:  # Average
            raw += bytes(
                (
                    row[i]
                    - (
                        ((row[i - channels] if i >= channels else 0) + prev_row[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev_row[i],
                        prev_row[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise PngFormatError(f"unknown filter type {filter_type}")
        prev_row = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def png_ahash_features(payload: bytes, kind: str = "image", grid: int = 8) -> list[float]:
    """Perceptual feature vector: decode, luma-convert, average-pool to
    a ``grid``x``grid`` intensity map in [0, 1] — the aHash family.
    Pixel-identical re-encodes produce IDENTICAL features; small edits
    move a few cells. Signature matches the ``DECODERS`` contract."""
    width, height, channels, px = decode_png(payload)
    stride = width * channels
    sums = [0.0] * (grid * grid)
    counts = [0] * (grid * grid)
    for y in range(height):
        gy = y * grid // height
        rowbase = y * stride
        for x in range(width):
            o = rowbase + x * channels
            if channels >= 3:
                luma = 0.299 * px[o] + 0.587 * px[o + 1] + 0.114 * px[o + 2]
            else:
                luma = float(px[o])
            cell = gy * grid + (x * grid // width)
            sums[cell] += luma
            counts[cell] += 1
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]
