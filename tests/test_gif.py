"""GIF codec tests: LZW round-trips, interlace, multi-frame, the
12-bit table ceiling, and agreement with the header-only parser.

The round-trip tests are load-bearing for the width-bump convention
(functions/gif.py module docstring): the encoder and decoder grow the
code width at different points relative to their table insertions, so
any off-by-one desynchronizes them within a few dozen pixels.
"""

import numpy as np
import pytest

from webextract.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from webextract.operators.multimodal import parse_image_header


def _palette(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, 3)).astype(np.uint8)


# ------------------------------------------------------------- LZW


def test_lzw_roundtrip_simple():
    idx = [0, 1, 2, 3, 0, 1, 2, 3, 0, 0, 1, 1]
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_lzw_kwkwk_case():
    # runs of one symbol hit code == next_code (the KwKwK entry)
    idx = [1] * 50
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_lzw_single_symbol():
    assert lzw_decode(lzw_encode([3], 2), 2) == [3]


def test_lzw_empty():
    assert lzw_decode(lzw_encode([], 2), 2) == []


@pytest.mark.parametrize("mcs", [2, 3, 4, 8])
def test_lzw_roundtrip_random(mcs):
    rng = np.random.RandomState(mcs)
    idx = rng.randint(0, 1 << mcs, size=5000).tolist()
    assert lzw_decode(lzw_encode(idx, mcs), mcs) == idx


def test_lzw_width_growth_and_table_reset():
    # high-entropy stream long enough to fill all 4096 codes and force
    # the CLEAR-reset path (and every width 3..12 on the way)
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 4, size=120_000).tolist()
    data = lzw_encode(idx, 2)
    assert lzw_decode(data, 2) == idx


def test_lzw_rejects_out_of_range_index():
    with pytest.raises(ValueError, match="outside palette"):
        lzw_encode([4], 2)


# ------------------------------------------------------- container


@pytest.mark.parametrize("n_colors", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(n_colors, interlace):
    rng = np.random.RandomState(n_colors + interlace)
    pal = _palette(n_colors, seed=n_colors)
    arr = rng.randint(0, n_colors, size=(23, 17))
    b = encode_gif(arr, pal, interlace=interlace)
    out = decode_gif(b)
    assert out.shape == (23, 17, 3)
    assert np.array_equal(out, pal[arr])


def test_gif_one_pixel():
    pal = _palette(4)
    b = encode_gif(np.array([[2]]), pal)
    assert np.array_equal(decode_gif(b), pal[np.array([[2]])])


def test_gif_multi_frame():
    pal = _palette(8)
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 8, size=(5, 9)) for _ in range(3)]
    b = encode_gif(frames, pal)
    out = decode_gif_frames(b)
    assert len(out) == 3
    for got, idx in zip(out, frames):
        assert np.array_equal(got, pal[idx])
    # decode_gif = first frame (the check_and_read analog)
    assert np.array_equal(decode_gif(b), pal[frames[0]])


def test_gif_skips_extension_blocks():
    pal = _palette(4)
    arr = np.array([[0, 1], [2, 3]])
    b = encode_gif(arr, pal)
    # splice a GCE extension (0x21 0xF9, 4-byte block, terminator)
    # between the color table and the image descriptor
    img_at = b.index(0x2C, 13)
    spliced = b[:img_at] + bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]) + b[img_at:]
    assert np.array_equal(decode_gif(spliced), pal[arr])


def test_gif_header_parser_agrees_with_decoder():
    pal = _palette(16)
    arr = np.zeros((6, 11), dtype=np.int64)
    b = encode_gif(arr, pal)
    fmt, w, h, ok = parse_image_header(b)
    assert (fmt, ok) == ("gif", True)
    assert (h, w) == decode_gif(b).shape[:2]


def test_gif_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)


def test_gif_rejects_truncation():
    pal = _palette(4)
    b = encode_gif(np.array([[0, 1], [2, 3]]), pal)
    with pytest.raises(ValueError):
        decode_gif(b[: len(b) // 2])


def test_gif_rejects_non_power_of_two_palette():
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(np.array([[0]]), _palette(5))
