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


def test_draw_boxes_over_copy_and_fixed_color():
    from docling_eval_ray.functions.png import draw_boxes_over

    canvas = np.full((100, 100, 3), 200, np.uint8)
    before = canvas.copy()
    out = draw_boxes_over(
        canvas, [{"l": 10, "t": 10, "r": 50, "b": 40}],
        page_w=100.0, page_h=100.0, color=(200, 40, 40),
        order_line=False,
    )
    assert np.array_equal(canvas, before)  # input untouched (copy)
    # top edge stroked in the fixed color at the mapped pixel row
    assert tuple(out[9, 20]) == (200, 40, 40)
    # interior remains the underlay value
    assert tuple(out[25, 30]) == (200, 200, 200)


def test_page_underlay_rgb_deterministic_both_branches():
    from docling_eval_ray.functions.viz import page_underlay_rgb
    from docling_eval_ray.stages.media import synth_media_payload

    # find one doc id whose page ref takes the real-codec branch and one
    # that takes the textured-stub branch
    import hashlib

    def branch(doc_id):
        h = hashlib.blake2b(f"page/{doc_id}".encode(),
                            digest_size=8).digest()
        return int.from_bytes(h[:4], "big") % 3

    ids = [f"doc-{i:06d}" for i in range(30)]
    real = next(i for i in ids if branch(i) in (0, 1))
    stub = next(i for i in ids if branch(i) == 2)
    for did in (real, stub):
        a = page_underlay_rgb(did, width=64, height=48)
        b = page_underlay_rgb(did, width=64, height=48)
        assert a.shape == (48, 64, 3) and a.dtype == np.uint8
        assert np.array_equal(a, b)
    # the real-codec branch is lightened noise (>=192); stub is light
    assert page_underlay_rgb(real, width=32, height=32).min() >= 192
    assert page_underlay_rgb(stub, width=32, height=32).min() >= 230


def test_overlay_html_sink(ray_session, tmp_path):
    """Image-underlay overlay page (the reference's
    visualisations.py:79-226 analogue): two embedded PNGs per doc, both
    decodable, boxes stroked over the page image."""
    import base64
    import re

    from docling_eval_ray.functions.viz import write_overlay_html
    from docling_eval_ray.pipelines.evaluate import eval_records

    ds = eval_records(SF_DIR).limit(8)
    out = write_overlay_html(ds, str(tmp_path / "oviz")).to_pandas()
    assert len(out) == 8
    html = (tmp_path / "oviz"
            / f"{out['doc_id'].iloc[0]}.overlay.html").read_text()
    uris = re.findall(r'data:image/png;base64,([A-Za-z0-9+/=]+)', html)
    assert len(uris) == 2  # GT layer + prediction layer
    gt_img = decode_png(base64.b64decode(uris[0]))
    pred_img = decode_png(base64.b64decode(uris[1]))
    assert gt_img.shape == (256, 256, 3)
    # the two layers differ (GT blue vs prediction red strokes)
    assert (gt_img != pred_img).any()
    # GT stroke color present
    assert (gt_img == np.array([31, 80, 180])).all(axis=2).any()
    assert (pred_img == np.array([200, 40, 40])).all(axis=2).any()
    assert "<table>" in html
