"""Pure-Python GIF codec: REAL LZW pixel decode/encode, no image lib.

GIF is the second mainstream raster format (after PNG, functions/
png.py) whose full pixel path needs nothing beyond hand-rolled public
specification knowledge: the container is the GIF87a/89a block
structure and the image data is variable-width LZW (GIF spec Appendix
F, public since 1990) over palette indices — no entropy-coding library
required, so the "no codec in this container" boundary that stubs JPEG
does NOT apply here either. This module implements it end to end:

- :func:`decode_gif` / :func:`decode_gif_frames`: signature check,
  logical-screen + global-color-table parse, extension-block skip,
  per-frame image-descriptor walk (local palettes honored),
  sub-block reassembly, variable-width LZW decompression with code
  table reset on CLEAR and width growth to the 12-bit ceiling, and
  four-pass interlace reordering → (h, w, 3) uint8 frame(s).
- :func:`encode_gif`: the inverse — palette-index LZW compression
  (emit-on-miss with the just-assigned-code width-bump convention the
  decoder mirrors, CLEAR-reset when the table hits 4096), sub-block
  framing, optional interlace row permutation, multi-frame output.

The reference analog is ``check_and_read`` (ppocr/utils/
utility.py:95-104): a GIF is opened and its FIRST FRAME becomes the
pipeline image — :func:`decode_gif` returns exactly that frame; the
multi-frame variant is the fan-out the PDF branch of the same helper
performs (utility.py:110-120).

Width-bump synchronization (the one subtle point, documented so the
round-trip tests are understood as load-bearing): the encoder adds a
table entry immediately after each emitted code, while the decoder
reconstructs that entry only upon reading the NEXT code — the decoder
is one insertion behind at read time. Hence the encoder grows the
code width when the code it just ASSIGNED equals ``1 << width``
(that code can only be emitted later, by which point the decoder has
caught up), and the decoder grows it when its next free slot reaches
``1 << width``. Both are checked against the GIF spec's 12-bit cap.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_WIDTH = 12  # GIF spec: LZW codes never exceed 12 bits


# ---------------------------------------------------------------- LZW


def lzw_decode(data: bytes, mcs: int) -> list[int]:
    """Variable-width LZW → palette-index list (GIF spec Appendix F).

    ``mcs`` is the LZW minimum code size; codes start at ``mcs + 1``
    bits, the table resets on CLEAR (``1 << mcs``), and decoding stops
    at END-OF-INFORMATION (``CLEAR + 1``) or stream exhaustion.
    """
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = eoi + 1
    out: list[int] = []
    prev: int | None = None

    acc = 0
    nbits = 0
    pos = 0

    def read() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    while True:
        code = read()
        if code is None or code == eoi:
            return out
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if prev is None:
            # first data code after a CLEAR must be a root
            if code >= clear:
                raise ValueError(f"LZW: non-root code {code} after clear")
            out.append(code)
            prev = code
            continue
        if code < next_code and code in table:
            entry = table[code]
        elif code == next_code:
            # the KwKwK case: code refers to the entry being built
            entry = table[prev] + (table[prev][0],)
        else:
            raise ValueError(f"LZW: code {code} out of range (<{next_code})")
        out.extend(entry)
        if next_code < (1 << _MAX_WIDTH):
            table[next_code] = table[prev] + (entry[0],)
            next_code += 1
            if next_code >= (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = code


def lzw_encode(indices, mcs: int) -> bytes:
    """Palette-index sequence → GIF LZW byte stream (CLEAR … EOI)."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        if not 0 <= k < clear:
            raise ValueError(f"index {k} outside palette of {clear}")
        nk = cur + (k,)
        if nk in table:
            cur = nk
            continue
        emit(table[cur])
        if next_code < (1 << _MAX_WIDTH):
            table[nk] = next_code
            next_code += 1
            # the just-assigned code can't be emitted at this width;
            # grow now so the decoder (one insertion behind) agrees
            if next_code - 1 == (1 << width) and width < _MAX_WIDTH:
                width += 1
        else:
            # table full: reset, decoder mirrors on CLEAR
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        cur = (k,)
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------- interlace


def _interlace_order(h: int) -> list[int]:
    """GIF four-pass interlace row order (spec §20, Appendix E)."""
    rows: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


# ---------------------------------------------------------- container


def _sub_blocks(body: bytes) -> bytes:
    """Frame a raw byte stream into ≤255-byte GIF sub-blocks."""
    out = bytearray()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("truncated sub-block stream")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(b[pos : pos + n])
        if pos + n > len(b):
            raise ValueError("truncated sub-block")
        pos += n


def encode_gif(
    frames,
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """Index frame(s) + (n, 3) palette → a valid GIF89a.

    ``frames`` is one (h, w) uint index array or a list of them (a
    multi-image GIF — the animation container, timing extensions
    omitted; decoders that honor frames see them in order). Palette
    length must be a power of two in [2, 256]; all frames share the
    global color table and the logical screen is the first frame's
    size (further frames carry their own descriptor sizes).
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    pal = np.asarray(palette, dtype=np.uint8)
    n_colors = pal.shape[0]
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3)")
    if n_colors < 2 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 2")
    size_bits = max(n_colors.bit_length() - 1, 1)
    mcs = max(size_bits, 2)

    h0, w0 = frames[0].shape
    packed = 0x80 | ((size_bits - 1) << 4) | (size_bits - 1)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w0, h0, packed, 0, 0))
    out.extend(pal.tobytes())
    for arr in frames:
        arr = np.asarray(arr)
        if arr.ndim != 2:
            raise ValueError("each frame must be (h, w) palette indices")
        h, w = arr.shape
        if int(arr.max(initial=0)) >= n_colors:
            raise ValueError("frame index outside palette")
        rows = arr[_interlace_order(h)] if interlace else arr
        out.append(0x2C)
        out.extend(struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0))
        out.append(mcs)
        out.extend(_sub_blocks(lzw_encode(rows.reshape(-1).tolist(), mcs)))
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(b: bytes) -> list[np.ndarray]:
    """Full pixel decode of EVERY image block → [(h, w, 3) uint8].

    Walks the 87a/89a block structure: extensions (0x21) are skipped
    by sub-block framing, each image descriptor (0x2C) is LZW-decoded
    against its local palette if present else the global one, and the
    interlace flag triggers the four-pass row reordering.
    """
    if b[:6] not in GIF_SIGS:
        raise ValueError("not a GIF: bad signature")
    if len(b) < 13:
        raise ValueError("truncated logical screen descriptor")
    _, _, packed, _, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            _, pos = _read_sub_blocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        _, _, w, h, ipacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
            if pal.size != 3 * n:
                raise ValueError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image block with no color table")
        mcs = b[pos]
        pos += 1
        data, pos = _read_sub_blocks(b, pos)
        idx = lzw_decode(data, mcs)
        if len(idx) < w * h:
            raise ValueError(f"LZW yielded {len(idx)} px, want {w * h}")
        arr = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        if int(arr.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        if ipacked & 0x40:  # interlaced: invert the four-pass order
            order = _interlace_order(h)
            de = np.empty_like(arr)
            de[order] = arr
            arr = de
        frames.append(pal[arr])
    raise ValueError("missing GIF trailer")


def decode_gif(b: bytes) -> np.ndarray:
    """First frame → (h, w, 3) uint8 — the ``check_and_read`` analog
    (ppocr/utils/utility.py:95-104: cv2.VideoCapture(gif).read()[1])."""
    frames = decode_gif_frames(b)
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames[0]
