"""Pure-Python PNG codec: REAL pixel decode/encode, no image library.

PNG is the one mainstream raster format whose full pixel path needs
nothing beyond the standard library — the container is zlib (stdlib)
over per-scanline difference filters (RFC 2083 / ISO 15948 §9, public
specification), so the "no codec library in this container" boundary
that stubs JPEG/video decoding does NOT apply here. This module
implements the truecolor-8 subset end to end:

- :func:`decode_png`: signature check, chunk walk with CRC-32
  verification, IDAT concatenation, zlib inflate, and scanline
  UNFILTERING for all five filter types (None/Sub/Up/Average/Paeth)
  → an (h, w, 3) uint8 array.
- :func:`encode_png`: the inverse — per-scanline FILTERING (any
  chosen type per row), zlib deflate, CRC'd chunk framing.

The reference analog is ``DecodeImage`` (ppocr/data/imaug/
operators.py:30-68): raw bytes → ndarray as the first pipeline op.

Scope: bit depth 8, color type 2 (truecolor), no interlacing — the
shape the pipeline's synthesized fixtures and the common web thumbnail
case use; anything else raises with a precise message (JPEG stays
legitimately stubbed: a DCT entropy decoder IS a codec library).
Filter arithmetic is per-byte modulo 256 exactly as specified; rows
are processed sequentially because Up/Average/Paeth reference the
RECONSTRUCTED previous row (an inherent data dependence — within-row
vectorization is possible for None/Up, and at training-data scale the
parallelism axis is media rows per Arrow batch, not pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: truecolor-8


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_chunks(b: bytes):
    """Yield (tag, body) for every chunk, verifying each CRC-32."""
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        yield tag, body
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int) -> np.ndarray:
    stride = w * _BPP
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"inflated stream is {len(raw)} bytes, want {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(_BPP, stride):
                line[i] = (line[i] + line[i - _BPP]) & 0xFF
        elif ftype == 2:  # Up
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(
                    np.uint8
                ).tobytes()
            )
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - _BPP] if i >= _BPP else 0
                line[i] = (line[i] + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - _BPP] if i >= _BPP else 0
                up_left = int(prev[i - _BPP]) if i >= _BPP else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), up_left)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out.reshape(h, w, _BPP)


def decode_png(b: bytes) -> np.ndarray:
    """Full pixel decode → (h, w, 3) uint8. Truecolor-8 only."""
    ihdr = None
    idat = bytearray()
    for tag, body in png_chunks(b):
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, color) != (8, 2):
        raise ValueError(
            f"only truecolor-8 supported (depth={depth}, color={color})"
        )
    if interlace:
        raise ValueError("interlaced PNG not supported")
    if comp or filt:
        raise ValueError("nonstandard compression/filter method")
    return _unfilter(zlib.decompress(bytes(idat)), w, h)


def _filter_row(
    row: np.ndarray, prev: np.ndarray, ftype: int
) -> bytes:
    stride = len(row)
    cur = row.astype(np.int32)
    pr = prev.astype(np.int32)
    if ftype == 0:
        out = cur
    elif ftype == 1:
        left = np.concatenate([np.zeros(_BPP, np.int32), cur[:-_BPP]])
        out = cur - left
    elif ftype == 2:
        out = cur - pr
    elif ftype == 3:
        left = np.concatenate([np.zeros(_BPP, np.int32), cur[:-_BPP]])
        out = cur - (left + pr) // 2
    elif ftype == 4:
        left = np.concatenate([np.zeros(_BPP, np.int32), cur[:-_BPP]])
        up_left = np.concatenate([np.zeros(_BPP, np.int32), pr[:-_BPP]])
        pred = np.array(
            [
                _paeth(int(left[i]), int(pr[i]), int(up_left[i]))
                for i in range(stride)
            ],
            dtype=np.int32,
        )
        out = cur - pred
    else:
        raise ValueError(f"unknown filter type {ftype}")
    return bytes((out % 256).astype(np.uint8).tobytes())


def encode_png(arr: np.ndarray, row_filter=None) -> bytes:
    """(h, w, 3) uint8 → a valid truecolor-8 PNG. ``row_filter``
    picks the filter type per row index (default: 0/None — simplest
    valid stream); the synthesis fixtures pass ``lambda y: y % 5`` so
    the DECODER exercises every filter type on driver data."""
    if arr.ndim != 3 or arr.shape[2] != _BPP:
        raise ValueError("expected (h, w, 3) array")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * _BPP).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * _BPP, dtype=np.uint8)
    for y in range(h):
        ftype = row_filter(y) if row_filter else 0
        raw.append(ftype)
        raw.extend(_filter_row(flat[y], prev, ftype))
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample with the EXACT-integer index map
    ``src = (dst * src_dim) // dst_dim`` — floor mapping, no float in
    the index path, so the oracle can state every output pixel from
    the input-pixel arithmetic."""
    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[np.ix_(ys, xs)]
