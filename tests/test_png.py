"""From-scratch PNG codec (functions/png.py): round-trips across all
five scanline filters and all four 8-bit color types, error paths, the
real-decode branch of pixels_from_payload, and the PNG comparison sink
(S11/M8 parity for the no-PIL container)."""

import numpy as np
import pytest

from docling_eval_ray.functions.png import (
    boxes_image,
    decode_png,
    encode_png,
    render_boxes_png,
    resize_nearest,
    to_grayscale,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    shape = (13, 7) if channels == 1 else (13, 7, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_gradient_compresses_and_roundtrips():
    """A smooth gradient (the filtered cases real encoders hit) must
    survive every filter and compress below raw size with Sub/Up."""
    y, x = np.mgrid[0:64, 0:64]
    img = ((y * 2 + x * 2) % 256).astype(np.uint8)
    raw = img.size
    for f in range(5):
        data = encode_png(img, filter_type=f)
        assert np.array_equal(decode_png(data), img)
    assert len(encode_png(img, filter_type=1)) < raw


def test_png_error_paths():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError, match="shape"):
        encode_png(np.zeros((4, 4, 5), np.uint8))
    # corrupt a chunk byte → CRC mismatch
    good = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    good[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))


def test_resize_and_grayscale():
    img = np.zeros((8, 8, 3), np.uint8)
    img[:4] = (255, 0, 0)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    g = to_grayscale(img)
    assert g.shape == (8, 8)
    assert abs(g[0, 0] - 0.299 * 255) < 1e-9 and g[7, 7] == 0.0


def test_pixels_from_payload_real_png_decode():
    """A payload whose body is a real PNG goes through the actual
    codec (luma + nearest resize), not the stub expansion."""
    from docling_eval_ray.stages.media import HEADER_SIZE, pixels_from_payload

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    payload = b"\x00" * HEADER_SIZE + encode_png(img)
    px = pixels_from_payload(payload)
    assert px.shape == (32, 32)
    want = resize_nearest(to_grayscale(img), 32, 32)
    assert np.allclose(px, want)
    # non-PNG body still takes the deterministic stub path
    stub = pixels_from_payload(b"\x00" * HEADER_SIZE + b"JPEGJPEGJPEG")
    assert stub.shape == (32, 32) and not np.allclose(stub, px)


def test_render_boxes_png_draws_outlines_and_order_line():
    boxes = [{"l": 100, "t": 100, "r": 400, "b": 300},
             {"l": 500, "t": 500, "r": 900, "b": 800}]
    img = decode_png(render_boxes_png(boxes))
    assert img.shape == (256, 256, 3)
    nonwhite = (img != 255).any(axis=2)
    assert nonwhite.sum() > 100  # outlines + polyline drawn
    # first box's top edge uses the first palette color
    assert tuple(img[25, 30]) == (31, 119, 180)
    assert boxes_image([]).shape == (256, 256, 3)


def test_comparison_png_sink(ray_session, tmp_path):
    """S11 per-doc comparison PNG: one decodable file per doc, GT page
    left / prediction right with the divider column."""
    from docling_eval_ray.functions.viz import write_comparison_png
    from docling_eval_ray.pipelines.evaluate import eval_records

    ds = eval_records(SF_DIR).limit(20)
    out = write_comparison_png(ds, str(tmp_path / "pviz")).to_pandas()
    assert len(out) == 20
    p = tmp_path / "pviz" / f"{out['doc_id'].iloc[0]}.png"
    img = decode_png(p.read_bytes())
    assert img.shape == (256, 516, 3)  # 256 + 4px divider + 256
    assert (img[:, 256:260] == 0).all()  # the divider
    assert (img != 255).any()


def test_pixels_from_payload_corrupt_png_falls_back_to_stub():
    """A corrupt PNG body must NOT raise out of the pixel source (the
    pHash census is skip-and-count): it falls back to the stub."""
    from docling_eval_ray.stages.media import HEADER_SIZE, pixels_from_payload

    good = encode_png(np.zeros((10, 10, 3), np.uint8))
    bad = bytearray(good)
    bad[25] ^= 0xFF  # CRC mismatch inside IHDR/IDAT
    px = pixels_from_payload(b"\x00" * HEADER_SIZE + bytes(bad))
    assert px.shape == (32, 32)  # stub path, no exception


def test_grayscale_gray_alpha_channels():
    """decode_png emits H×W×2 for gray+alpha; to_grayscale must pass
    the luminance channel through instead of crashing on the BT.601
    matmul."""
    img = np.zeros((5, 4, 2), np.uint8)
    img[:, :, 0] = 200  # luminance
    img[:, :, 1] = 7    # alpha
    g = to_grayscale(decode_png(encode_png(img)))
    assert g.shape == (5, 4) and (g == 200.0).all()
