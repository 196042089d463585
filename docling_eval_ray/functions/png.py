"""Minimal from-scratch PNG codec — stdlib ``zlib`` + ``struct`` only.

The reference renders PNG visualization pages with PIL/matplotlib
(readingorder_evaluator.py:298-498) and decodes raster payloads through
PIL (utils/utils.py); this container has neither, but PNG itself needs
nothing beyond DEFLATE, which IS in the stdlib. This module implements
the public PNG format (W3C PNG spec / RFC 2083) directly:

* ``encode_png`` — 8-bit grayscale / gray+alpha / RGB / RGBA,
  non-interlaced. Per-row filter selectable (None/Sub/Up/Average/
  Paeth); default None keeps the encoder a pure memcpy + DEFLATE.
* ``decode_png`` — same color types, all five scanline filters,
  non-interlaced. Filters Sub/Average/Paeth carry a sequential
  data dependency along the row, so unfiltering walks rows in Python
  with vectorized within-row math where the filter allows (Up is one
  numpy add; our own encoder emits filter 0, which is free).

This upgrades the image-codec edge (SURVEY §2 M8/S11) from "stubbed —
no PIL" to a real, tested codec for the format the pipeline itself
emits; JPEG stays out of scope (no stdlib entropy coder).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: PNG color types for 1/2/3/4 channels (8-bit depth)
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS = {v: k for k, v in _COLOR_TYPE.items()}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int16 domain to avoid wrap)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                   np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Forward filter (encode direction) — pure vector ops."""
    left = np.zeros_like(row)
    left[bpp:] = row[:-bpp]
    upleft = np.zeros_like(prev)
    upleft[bpp:] = prev[:-bpp]
    if ftype == 0:
        return row
    if ftype == 1:
        return row - left
    if ftype == 2:
        return row - prev
    if ftype == 3:
        return row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
    if ftype == 4:
        return row - _paeth(left, prev, upleft)
    raise ValueError(f"unknown PNG filter type {ftype}")


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode a uint8 array (H×W, H×W×2, H×W×3 or H×W×4) as PNG."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, ch = a.shape
    bpp = ch
    flat = a.reshape(h, w * ch)
    prev = np.zeros(w * ch, np.uint8)
    rows = []
    for y in range(h):
        rows.append(bytes([filter_type])
                    + _filter_row(filter_type, flat[y], prev, bpp).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA, any scanline filter) to a uint8 array; 2-D for grayscale,
    H×W×C otherwise."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or channels is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel payload has wrong length")
    bpp = channels
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up — no horizontal dependency
            rec = row + prev
        elif ftype == 1:  # Sub — sequential along x, per-pixel-group
            rec = row
            for x in range(bpp, stride):
                rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
        elif ftype == 3:  # Average
            rec = row
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (
                    b if pb <= pc_ else c
                )
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (the no-PIL resampler for hash inputs)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma; gray / gray+alpha inputs pass the luminance
    channel through (a 2-channel GA image has no chroma to weight)."""
    if img.ndim == 2:
        return img.astype(np.float64)
    if img.shape[2] < 3:  # gray or gray+alpha
        return img[:, :, 0].astype(np.float64)
    rgb = img[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def render_boxes_png(boxes, *, width: int = 256, height: int = 256,
                     page_w: float = 1000.0, page_h: float = 1000.0,
                     order_line: bool = True) -> bytes:
    """Rasterize page boxes (dicts with l/t/r/b in page coords) to a
    PNG: white page, 2px colored outlines in list order, optional
    reading-order polyline through the box centers — the PNG twin of
    ``viz._svg_page`` (reference S11 renders these pages with
    matplotlib; this is numpy slicing + the from-scratch encoder)."""
    return encode_png(boxes_image(boxes, width=width, height=height,
                                  page_w=page_w, page_h=page_h,
                                  order_line=order_line))


_BOX_PALETTE = np.array(
    [[31, 119, 180], [255, 127, 14], [44, 160, 44], [214, 39, 40],
     [148, 103, 189], [140, 86, 75], [227, 119, 194], [127, 127, 127]],
    np.uint8,
)


def draw_boxes_over(img: np.ndarray, boxes, *, page_w: float = 1000.0,
                    page_h: float = 1000.0, color=None,
                    order_line: bool = True) -> np.ndarray:
    """Stroke page boxes (dicts with l/t/r/b in page coords) onto a
    COPY of an existing H×W×3 image — the image-underlay overlay
    primitive behind the reference's draw-bboxes-over-page-images viz
    (visualisation/visualisations.py:79-226 with PIL ImageDraw).
    ``color=None`` cycles the categorical palette (per-item colors, as
    ``boxes_image`` does); a fixed ``(r, g, b)`` tuple draws every box
    in that color (GT vs prediction layers)."""
    img = np.ascontiguousarray(img[:, :, :3], np.uint8).copy()
    height, width = img.shape[:2]

    def px(v, page_dim, out_dim):
        return int(np.clip(v / page_dim * (out_dim - 1), 0, out_dim - 1))

    centers = []
    for i, box in enumerate(boxes):
        l = px(box["l"], page_w, width)
        r = px(box["r"], page_w, width)
        t = px(box["t"], page_h, height)
        b = px(box["b"], page_h, height)
        c = (_BOX_PALETTE[i % len(_BOX_PALETTE)] if color is None
             else np.asarray(color, np.uint8))
        for edge in range(2):  # 2px outline
            tt, bb = min(t + edge, height - 1), min(b + edge, height - 1)
            ll, rr = min(l + edge, width - 1), min(r + edge, width - 1)
            img[tt, l:r + 1] = c
            img[bb, l:r + 1] = c
            img[t:b + 1, ll] = c
            img[t:b + 1, rr] = c
        centers.append(((t + b) // 2, (l + r) // 2))
    if order_line and len(centers) > 1:
        for (y0, x0), (y1, x1) in zip(centers, centers[1:]):
            n = max(abs(y1 - y0), abs(x1 - x0), 1)
            ys = np.linspace(y0, y1, n + 1).round().astype(int)
            xs = np.linspace(x0, x1, n + 1).round().astype(int)
            img[ys, xs] = (60, 60, 60)
    return img


def boxes_image(boxes, *, width: int = 256, height: int = 256,
                page_w: float = 1000.0, page_h: float = 1000.0,
                order_line: bool = True) -> np.ndarray:
    """The raw H×W×3 rasterization behind ``render_boxes_png`` (kept
    separate so callers can compose pages before encoding): palette
    strokes on a white page via ``draw_boxes_over``."""
    canvas = np.full((height, width, 3), 255, np.uint8)
    return draw_boxes_over(canvas, boxes, page_w=page_w, page_h=page_h,
                           color=None, order_line=order_line)
