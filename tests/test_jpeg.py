"""Tests for the pure-Python baseline JPEG codec (functions/jpeg.py).

Strategy: the DC-only/constant-block path is EXACT by construction and
asserted bit-for-bit (it is also the oracle fixture, q:jpeg_pixels);
the general AC path cannot be exact (JPEG is lossy) and is pinned by
(a) the DCT/IDCT orthogonality property, (b) prefix-freeness of the
canonical Huffman construction, and (c) error-bounded pixel roundtrips
through the full entropy encode/decode under flat and standard
quantization tables.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webextract.functions.jpeg import (
    QUANT_CHROMA,
    QUANT_FLAT,
    QUANT_LUMA,
    ZIGZAG,
    _AC_CHROMA,
    _AC_LUMA,
    _BitWriter,
    _canonical_codes,
    _DC_CHROMA,
    _DC_LUMA,
    decode_jpeg,
    dct2,
    encode_jpeg,
    idct2,
)


def constant_block_image(seed: int, bw: int, bh: int) -> np.ndarray:
    """The oracle-fixture shape: constant equal-channel 8x8 blocks."""
    i = np.arange(bh, dtype=np.int64)[:, None]
    j = np.arange(bw, dtype=np.int64)[None, :]
    v = ((seed + 11 * i + 5 * j) % 256).astype(np.uint8)
    plane = np.kron(v, np.ones((8, 8), dtype=np.uint8))
    return np.stack([plane] * 3, axis=-1)


# ------------------------------------------------------------ transforms


def test_zigzag_is_a_bijection_in_spec_order():
    assert len(ZIGZAG) == 64
    assert len(set(ZIGZAG)) == 64
    # T.81 Figure 5 opening run
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-1] == (7, 7)


def test_dct_orthogonality_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        x = rng.uniform(-128, 127, (8, 8))
        assert np.allclose(idct2(dct2(x)), x, atol=1e-9)
    # DC of a constant block is 8*value; all AC vanish
    f = dct2(np.full((8, 8), 41.0))
    assert abs(f[0, 0] - 328.0) < 1e-9
    f[0, 0] = 0
    assert np.abs(f).max() < 1e-9


def test_canonical_huffman_tables_are_prefix_free():
    for bits, huffval in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
        assert sum(bits) == len(huffval)
        codes = _canonical_codes(bits, huffval)
        assert len(codes) == len(huffval)
        as_strings = sorted(
            format(c, f"0{ln}b") for c, ln in codes.values()
        )
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a), f"{a} is a prefix of {b}"
        # T.81 C.2: no code of all 1-bits at max length ambiguity —
        # every code must be < 2^len - 1 OR be the lexicographic last
        for c, ln in codes.values():
            assert c < (1 << ln)


# ------------------------------------------------------- exact fixtures


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("restart", [0, 2])
def test_constant_block_roundtrip_is_bit_exact(subsample, restart):
    for seed in (0, 1, 37, 200, 255):
        img = constant_block_image(seed, bw=6, bh=4)
        blob = encode_jpeg(
            img, QUANT_FLAT, QUANT_FLAT,
            subsample=subsample, restart_interval=restart,
        )
        out = decode_jpeg(blob)
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_header_parser_agrees_with_codec():
    from webextract.operators.multimodal import parse_image_header

    img = constant_block_image(5, bw=4, bh=2)  # 32x16
    fmt, w, h, ok = parse_image_header(
        encode_jpeg(img, QUANT_FLAT, QUANT_FLAT)
    )
    assert (fmt, w, h) == ("jpeg", 32, 16)


def test_decode_image_dispatches_jpeg():
    from webextract.operators.multimodal import decode_image

    img = constant_block_image(9, bw=2, bh=2)
    assert np.array_equal(
        decode_image(encode_jpeg(img, QUANT_FLAT, QUANT_FLAT)), img
    )


# ------------------------------------------------------ lossy roundtrips


def test_flat_quant_roundtrip_error_is_tiny():
    rng = np.random.default_rng(11)
    for shape in ((8, 8), (24, 16), (21, 13), (1, 1), (9, 17)):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, QUANT_FLAT, QUANT_FLAT))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 5, (shape, err)


def test_standard_tables_on_smooth_gradient():
    gx = np.linspace(0, 255, 64, dtype=np.uint8)
    img = np.stack([np.tile(gx, (32, 1))] * 3, axis=-1)
    out = decode_jpeg(encode_jpeg(img, QUANT_LUMA, QUANT_CHROMA))
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 12, err


def test_subsampled_constant_chroma_is_exact_in_chroma():
    # equal channels => chroma exactly 128; 4:2:0 averaging of a
    # constant is lossless, so only luma quantization error remains
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    img = np.stack([plane] * 3, axis=-1)
    out = decode_jpeg(encode_jpeg(img, QUANT_FLAT, QUANT_FLAT, subsample=True))
    # channels stay equal (gray in, gray out)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 0], out[..., 2])
    err = np.abs(out[..., 0].astype(int) - plane.astype(int)).max()
    assert err <= 5, err


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, QUANT_FLAT, QUANT_FLAT))
    with_rst = decode_jpeg(
        encode_jpeg(img, QUANT_FLAT, QUANT_FLAT, restart_interval=1)
    )
    assert np.array_equal(base, with_rst)


# --------------------------------------------------------- 1-component


def test_grayscale_single_component_stream():
    """Hand-built 1-component DC-only stream → replicated channels."""
    dc_codes = _canonical_codes(*_DC_LUMA)
    ac_codes = _canonical_codes(*_AC_LUMA)
    values = [50, 128, 255, 0]  # 2x2 blocks of these values
    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(1 for _ in range(64))  # flat table id 0
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls_id, (bits, huffval) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA)):
        b2 = bytes([cls_id]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", len(b2) + 2) + b2
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    wr = _BitWriter()
    pred = 0
    for v in values:
        dc = 8 * (v - 128)
        diff = dc - pred
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        wr.write(code, ln)
        if s:
            wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        code, ln = ac_codes[0x00]  # EOB
        wr.write(code, ln)
        pred = dc
    wr.align()
    out += wr.out + b"\xff\xd9"

    arr = decode_jpeg(bytes(out))
    assert arr.shape == (16, 16, 3)
    for k, (i, j) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        block = arr[8 * i : 8 * i + 8, 8 * j : 8 * j + 8]
        assert np.array_equal(
            block, np.full((8, 8, 3), values[k], dtype=np.uint8)
        ), (k, values[k], block[0, 0])


# ------------------------------------------------------------- failures


def test_rejects_bad_and_truncated_streams():
    img = constant_block_image(1, 2, 2)
    blob = encode_jpeg(img, QUANT_FLAT, QUANT_FLAT)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG" + blob[2:])
    with pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # truncated in headers
    # progressive SOF2 refused with a precise message
    prog = bytearray(blob)
    sof_at = bytes(prog).find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    # entropy garbage → ValueError, not garbage pixels or hang
    sos_at = bytes(blob).find(b"\xff\xda")
    cut = blob[: sos_at + 14] + b"\xff\xff\xff\xff"
    with pytest.raises(ValueError):
        decode_jpeg(cut)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8))  # not (h,w,3)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8, 3), dtype=np.uint8))
