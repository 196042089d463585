"""Baseline JPEG codec (M8): roundtrip + known-answer + property tests
mirroring test_png.py's strategy for the PNG codec."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_eval_ray.functions.jpeg import (
    QT_LUMA,
    ZIGZAG,
    _quality_scale,
    decode_jpeg,
    encode_jpeg,
)


def test_flat_gray_roundtrips_exact():
    """A flat image has only a DC coefficient — quantization cannot
    move it at any quality."""
    img = np.full((16, 24), 128, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (16, 24)
    assert out.dtype == np.uint8
    assert (out == img).all()


def test_horizontal_gradient_near_exact_at_q95():
    g = np.tile(np.arange(32, dtype=np.uint8) * 8, (16, 1))
    d = decode_jpeg(encode_jpeg(g, quality=95))
    assert np.abs(d.astype(int) - g.astype(int)).max() <= 2


def test_rgb_block_constant_roundtrip():
    """8×8-aligned constant color blocks survive 4:4:4 exactly at
    high quality (each block is pure DC in all three planes)."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (4, 4, 3)).astype(np.float64)
    rgb = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(rgb, quality=95))
    assert d.shape == rgb.shape
    assert np.abs(d.astype(int) - rgb.astype(int)).max() <= 1


def test_q100_gray_noise_max_error_one():
    """Quality 100 → all-ones quant table: error is rounding only."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 1


def test_quality_scale_anchors():
    """libjpeg formula: q50 = base table, q100 = all ones."""
    assert (_quality_scale(QT_LUMA, 50) == QT_LUMA).all()
    assert (_quality_scale(QT_LUMA, 100) == 1).all()
    # lower quality → coarser (elementwise ≥) tables
    assert (_quality_scale(QT_LUMA, 10) >= _quality_scale(QT_LUMA, 90)).all()


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: scan starts 0,1,8,16 and ends at 63
    assert ZIGZAG[:4].tolist() == [0, 1, 8, 16]
    assert ZIGZAG[-1] == 63


def test_decoder_rejects_non_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame


def test_encoder_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_roundtrip_bounded_error(h, w, seed):
    """Any size (including non-multiples of 8: edge replication),
    any content: q90 roundtrip error stays within the quant budget."""
    rng = np.random.default_rng(seed)
    # smooth-ish content (block-constant + mild noise) so the q90
    # error bound is tight and deterministic
    img = np.clip(
        np.kron(
            rng.integers(40, 215, ((h + 7) // 8, (w + 7) // 8)),
            np.ones((8, 8)),
        )[:h, :w]
        + rng.integers(-3, 4, (h, w)),
        0, 255,
    ).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=90))
    assert d.shape == (h, w)
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 12


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_rgb_roundtrip_bounded_error(h, w, seed):
    rng = np.random.default_rng(seed)
    img = np.clip(
        np.kron(
            rng.integers(40, 215, ((h + 7) // 8, (w + 7) // 8, 3)),
            np.ones((8, 8, 1)),
        )[:h, :w]
        + rng.integers(-2, 3, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=90))
    assert d.shape == (h, w, 3)
    # chroma rotation adds a few counts of slack on top of luma quant
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 24


def test_determinism():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_media_pixels_route_real_jpeg():
    """stages/media.py:pixels_from_payload must route JPEG payload
    bodies through the real decoder (not the hash stub): a flat-white
    JPEG must produce flat-white pixels."""
    from docling_eval_ray.stages.media import HEADER_SIZE, pixels_from_payload

    img = np.full((16, 16), 255, np.uint8)
    payload = b"\x00" * HEADER_SIZE + encode_jpeg(img, quality=90)
    px = pixels_from_payload(payload)
    assert px.shape == (32, 32)
    assert (px == 255.0).all()


def test_fill_bytes_before_markers_are_skipped():
    """Regression: T.81 B.1.1.2 allows 0xFF pad bytes before any
    marker; the decoder must not read the real marker as a segment
    length."""
    import numpy as np

    from docling_eval_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 16), 128, np.uint8)
    data = encode_jpeg(img, quality=90)
    # inject a pad byte before every marker segment after SOI
    padded = bytearray(data[:2])
    i = 2
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] not in (0x00, 0xD8, 0xD9):
            padded.append(0xFF)  # pad run
        padded.append(data[i])
        i += 1
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, decode_jpeg(data))
