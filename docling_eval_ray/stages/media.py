"""Multimodal column stages: opaque binary payloads + typed metadata.

Media rides as ``binary`` columns with a ``media_ref`` key — never
inlined into JSON (the reference base64-inlines page images,
utils/utils.py:107-113, which explodes row width; here refs point into a
side table). Decode/resize/feature-extract run as actor-pool
``map_batches`` stages with SMALL batch sizes (fat rows × batch ×
concurrency must fit the worker heap).

PNG and baseline JPEG are REAL codecs here (from-scratch stdlib
implementations, ``functions/png.py`` / ``functions/jpeg.py``): a third
of the synthetic payloads carry actual encoded PNG bodies and another
third baseline JFIF bodies, which decode/resize/pHash process through
genuine pixel paths. The remaining third keeps a deterministic 16-byte
header (``DERIMG`` magic + width + height + seed) with seed-derived
pixel statistics — the no-codec formats a 100-TB corpus also contains
(video stays stubbed: no stdlib entropy coder covers H.26x). The
Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is identical for all three; swapping in PIL/ffmpeg changes
only the bodies marked STUB.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

# Module-scope, not lazy: these run INSIDE worker-executed fns/actor
# __init__s; runtime relative imports there raise ModuleNotFoundError on
# workers that can't import the repo path (module globals ship by value
# with cloudpickle, runtime imports go through the import system).
from ..functions.jpeg import decode_jpeg, encode_jpeg
from ..functions.png import (
    decode_png,
    encode_png,
    resize_nearest,
    to_grayscale,
)

_MAGIC = b"DERIMG"
# format string, not a struct.Struct instance: the module ships by-value
# with cloudpickle, and _struct.Struct objects don't pickle
_FMT = ">6sHHI"  # magic, width, height, seed
HEADER_SIZE = struct.calcsize(_FMT)


def synth_media_payload(media_ref: str) -> bytes:
    """Deterministic image payload for a media_ref. Refs with
    seed % 3 == 0 carry a REAL encoded PNG body and seed % 3 == 1 a
    REAL baseline JPEG body (noise pixels expanded from the ref hash,
    encoded by the from-scratch codecs in ``functions/png.py`` /
    ``functions/jpeg.py``) so the decode/resize/pHash stages exercise
    real formats end-to-end; the rest keep the opaque stand-in bytes
    (the no-codec formats a 100-TB corpus also contains)."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=8).digest()
    seed = int.from_bytes(h[:4], "big")
    if seed % 3 in (0, 1):
        width = 16 + (seed % 48)
        height = 16 + ((seed >> 8) % 48)
        # LOW-FREQUENCY pixels (a random 4×4 coarse grid bilinearly
        # upsampled), not white noise: real corpus images are
        # low-frequency, and noise is the degenerate worst case for
        # JPEG entropy coding — it made every synthetic payload ~10×
        # the codec work of a natural image and dominated the media
        # stage wall (r5 fix). Still a pure deterministic function of
        # the ref: the grid bytes come from the ref hash.
        coarse = np.frombuffer(
            hashlib.blake2b(h + b"grid", digest_size=48).digest(),
            dtype=np.uint8,
        ).reshape(4, 4, 3).astype(np.float64)
        ys = np.linspace(0.0, 3.0, height)
        xs = np.linspace(0.0, 3.0, width)
        y0 = np.minimum(ys.astype(np.int64), 2)
        x0 = np.minimum(xs.astype(np.int64), 2)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        img = (
            coarse[y0][:, x0] * (1 - fy) * (1 - fx)
            + coarse[y0 + 1][:, x0] * fy * (1 - fx)
            + coarse[y0][:, x0 + 1] * (1 - fy) * fx
            + coarse[y0 + 1][:, x0 + 1] * fy * fx
        ).round().astype(np.uint8)
        if seed % 3 == 0:
            body = encode_png(img)
        else:
            body = encode_jpeg(img, quality=85)
        return struct.pack(_FMT, _MAGIC, width, height, seed) + body
    width = 64 + (seed % 192)
    height = 64 + ((seed >> 8) % 192)
    body = hashlib.blake2b(h, digest_size=32).digest() * 4
    return struct.pack(_FMT, _MAGIC, width, height, seed) + body


def media_table_for_documents(ds):
    """Explode a documents Dataset into its media side table
    (media_ref, payload, n_bytes) — one row per media span."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0)
        flat = spans.flatten()
        refs = flat.field("media_ref")
        refs = refs.filter(pc.not_equal(refs, "")).to_pylist()
        payloads = [synth_media_payload(r) for r in refs]
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    # batch per BLOCK (batch_size=None), not Ray's 1024-row default:
    # the default coalesces the synth-split blocks into a handful of
    # fat tasks and serializes the payload-synthesis CPU (r5 stats
    # reading); per-block tasks keep the pool busy
    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=None)


class DecodeImage:
    """Actor-pool decode stage: payload → (width, height, ok).

    PNG and baseline-JPEG bodies go through the REAL from-scratch
    codecs (``functions/png.py`` / ``functions/jpeg.py`` — dims come
    from the actual pixel decode); other formats parse the
    deterministic header. Bad payloads become ok=False rows
    (skip-and-count), never raised."""

    def __init__(self):
        self._decode_png = decode_png  # bound once per actor
        self._decode_jpeg = decode_jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, ok = [], [], []
        for payload in t["payload"].to_pylist():
            try:
                magic, w, h, _seed = struct.unpack(_FMT, payload[:HEADER_SIZE])
                if magic != _MAGIC:
                    raise ValueError("bad magic")
                body = payload[HEADER_SIZE:]
                if body[:8] == b"\x89PNG\r\n\x1a\n":
                    img = self._decode_png(body)
                    h, w = img.shape[0], img.shape[1]
                elif body[:2] == b"\xff\xd8":
                    img = self._decode_jpeg(body)
                    h, w = img.shape[0], img.shape[1]
                widths.append(w)
                heights.append(h)
                ok.append(True)
            except Exception:
                widths.append(0)
                heights.append(0)
                ok.append(False)
        return (
            t.select(["media_ref", "n_bytes"])
            .append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("decode_ok", pa.array(ok, pa.bool_()))
        )


class ImageFeatures:
    """Actor-pool feature extraction: payload → small feature vector.

    STUB: 8-dim byte-histogram of the payload body (deterministic);
    a real stage would run batched model inference here, with
    ``num_cpus`` matched to the model's thread pool (reference A1/A2)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for payload in t["payload"].to_pylist():
            body = np.frombuffer(payload[HEADER_SIZE:], dtype=np.uint8)
            hist, _ = np.histogram(body, bins=8, range=(0, 256))
            total = max(1, len(body))
            feats.append((hist / total).astype(np.float32))
        return pa.table(
            {
                "media_ref": t["media_ref"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def media_pipeline(sf_dir: str, *, batch_size: int = 256, concurrency=None):
    """documents → media side table → decode → features.

    ``batch_size`` is deliberately small: payload rows are wide, and
    batch × concurrency bounds stage memory."""
    from ..sources.interleaved import (
        read_interleaved_documents,
        synth_read_blocks,
    )
    from .util import stage

    # split the read so per-doc payload synthesis (real codec encodes)
    # parallelizes — the single-row-group fixture file otherwise yields
    # ONE block and the explode runs serially (r5 media wall fix)
    docs = read_interleaved_documents(
        sf_dir, override_num_blocks=synth_read_blocks(sf_dir)
    )
    # materialize the (small) media side table once: the two branches
    # would otherwise each re-run synthesis + span explosion + payload
    # generation (Ray Data does not share sub-plans across Datasets)
    media = media_table_for_documents(docs).materialize()
    decoded = stage(media, DecodeImage, batch_size=batch_size,
                    concurrency=concurrency)
    feats = stage(media, ImageFeatures, batch_size=batch_size,
                  concurrency=concurrency)
    return decoded, feats


def media_decode_stats(sf_dir: str):
    """Rows-only query: decode metadata for every media span.

    Single fused streaming job — unlike ``media_pipeline`` this
    consumes only the decode branch, so the share-point
    ``materialize()`` (a pipeline break costing a full extra job of
    fixed scheduling latency) is skipped: read → synth → explode →
    decode runs as ONE streaming pass."""
    from ..sources.interleaved import (
        read_interleaved_documents,
        synth_read_blocks,
    )
    from .util import stage

    docs = read_interleaved_documents(
        sf_dir, override_num_blocks=synth_read_blocks(sf_dir)
    )
    media = media_table_for_documents(docs)
    # batch per block (None), not a row-count batch: a row-count batch
    # re-coalesces the synth-split blocks into a handful of fat fused
    # tasks and serializes the codec CPU (ds.stats() reading, r5); the
    # block granularity set by synth_read_blocks IS the memory bound.
    return stage(media, DecodeImage, batch_size=None)


class ResizeImage:
    """Actor-pool resize stage: payload → payload with the longest side
    capped at ``max_dim`` (aspect preserved, never upscaled).

    PNG and baseline-JPEG bodies are REALLY resampled (decode →
    nearest-neighbor → re-encode via ``functions/png.py`` /
    ``functions/jpeg.py``, codecs bound once per actor); other formats
    rewrite the deterministic header. The Ray-side contract is the same
    either way: binary in → binary out, new dimensions as typed
    columns, small batches bound memory."""

    def __init__(self, max_dim: int = 128):
        self._max = max_dim
        self._codec = (decode_png, encode_png, resize_nearest)
        self._jpeg = (decode_jpeg, encode_jpeg)

    def __call__(self, t: pa.Table) -> pa.Table:
        decode_png, encode_png, resize_nearest = self._codec
        decode_jpeg, encode_jpeg = self._jpeg
        payloads, widths, heights = [], [], []
        for payload in t["payload"].to_pylist():
            magic, w, h, seed = struct.unpack(_FMT, payload[:HEADER_SIZE])
            scale = min(1.0, self._max / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            body = payload[HEADER_SIZE:]
            if body[:8] == b"\x89PNG\r\n\x1a\n" and (nw, nh) != (w, h):
                try:
                    body = encode_png(
                        resize_nearest(decode_png(body), nh, nw)
                    )
                except Exception:
                    pass  # corrupt PNG: keep the original body (the
                    # decode stage censuses it as ok=False)
            elif body[:2] == b"\xff\xd8" and (nw, nh) != (w, h):
                try:
                    body = encode_jpeg(
                        resize_nearest(decode_jpeg(body), nh, nw),
                        quality=85,
                    )
                except Exception:
                    pass  # corrupt JPEG: same skip-and-count contract
            payloads.append(
                struct.pack(_FMT, magic, nw, nh, seed) + body
            )
            widths.append(nw)
            heights.append(nh)
        return pa.table(
            {
                "media_ref": t["media_ref"],
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
            }
        )


_VID_MAGIC = b"DERVID"
_VID_FMT = ">6sHHI"  # magic, n_frames, fps, seed


def synth_video_payload(media_ref: str) -> bytes:
    """Deterministic fake video payload: header + per-frame bytes."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=8).digest()
    seed = int.from_bytes(h[:4], "big")
    n_frames = 12 + seed % 48
    fps = 24
    body = hashlib.blake2b(h, digest_size=16).digest() * n_frames
    return struct.pack(_VID_FMT, _VID_MAGIC, n_frames, fps, seed) + body


class FrameSample:
    """flat-map stage: video payload → one row per SAMPLED frame
    (media_ref, frame_idx, t_sec, frame payload) at ``every``-th frame.

    STUB decoder (header-parsed frames); real impl seeks with ffmpeg per
    actor. Output rows are narrow — the wide video payload never
    amplifies across the sampled rows (frames slice the body)."""

    def __init__(self, every: int = 8):
        self._every = every

    def __call__(self, t: pa.Table) -> pa.Table:
        refs, idxs, ts, frames = [], [], [], []
        vh = struct.calcsize(_VID_FMT)
        for ref, payload in zip(t["media_ref"].to_pylist(),
                                t["payload"].to_pylist()):
            try:
                magic, n_frames, fps, _seed = struct.unpack(
                    _VID_FMT, payload[:vh]
                )
                if magic != _VID_MAGIC:
                    raise ValueError("bad magic")
            except Exception:
                continue  # skip-and-count happens at the decode stage
            body = payload[vh:]
            frame_size = max(1, len(body) // max(1, n_frames))
            for i in range(0, n_frames, self._every):
                refs.append(ref)
                idxs.append(i)
                ts.append(round(i / fps, 6))
                frames.append(body[i * frame_size:(i + 1) * frame_size])
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "t_sec": pa.array(ts, pa.float64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def video_frame_samples(sf_dir: str, *, every: int = 8,
                        batch_size: int = 64, concurrency=None):
    """Rows-only query: documents' media refs as synthetic videos →
    sampled frame rows (the video-column analogue of the image path)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from .util import stage

    from ..sources.interleaved import (
        read_interleaved_documents,
        synth_read_blocks,
    )

    docs = read_interleaved_documents(
        sf_dir, override_num_blocks=synth_read_blocks(sf_dir)
    )

    def to_videos(t: pa.Table) -> pa.Table:
        spans = t.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0)
        flat = spans.flatten()
        refs = flat.field("media_ref")
        refs = refs.filter(pc.not_equal(refs, "")).to_pylist()
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "payload": pa.array(
                    [synth_video_payload(r) for r in refs], pa.binary()
                ),
            }
        )

    videos = docs.map_batches(to_videos, batch_format="pyarrow")
    return stage(videos, FrameSample, kwargs=dict(every=every),
                 batch_size=batch_size, concurrency=concurrency)


def pixels_from_payload(payload: bytes) -> "np.ndarray":
    """32×32 grayscale pixels from a payload. PNG and baseline-JPEG
    bodies get a REAL decode (the from-scratch codecs in
    ``functions/png.py`` / ``functions/jpeg.py``) → BT.601 luma →
    nearest-neighbor resize; any other format falls back to the
    deterministic stub expansion. The pHash kernel downstream is the
    real algorithm either way."""
    body = payload[HEADER_SIZE:]
    if body[:8] == b"\x89PNG\r\n\x1a\n" or body[:2] == b"\xff\xd8":
        try:
            if body[:2] == b"\xff\xd8":
                img = decode_jpeg(body)
            else:
                img = decode_png(body)
            gray = to_grayscale(img)
            return resize_nearest(gray, 32, 32).astype(np.float64)
        except Exception:
            pass  # corrupt body → deterministic stub (skip-and-count
            # contract: a pixel source must never kill the census task)
    # counter-mode expansion: tiling the body verbatim repeats every
    # row, collapsing the DCT spectrum so EVERY image hashed identically
    raw = b"".join(
        hashlib.blake2b(body + i.to_bytes(2, "big"),
                        digest_size=32).digest()
        for i in range(32)
    )
    return np.frombuffer(raw, dtype=np.uint8).reshape(32, 32).astype(
        np.float64
    )


#: 32-point DCT-II basis shared by the kernel and the stage (built once
#: at import; ~8 KiB, picklable — fine as a module global).
_K32 = np.arange(32)
_DCT_BASIS = np.cos(np.pi * (2 * _K32[None, :] + 1) * _K32[:, None] / 64.0)


def phash64_from_pixels(px, basis=None) -> int:
    """64-bit perceptual hash: 2-D DCT-II of the 32×32 image, keep the
    8×8 low-frequency block, drop the DC term, threshold at the median
    (the standard pHash construction). Small pixel perturbations flip
    few bits (Hamming-near); distinct images land ~32 bits apart."""
    if basis is None:
        basis = _DCT_BASIS
    d = basis @ px @ basis.T
    vals = d[:8, :8].flatten()[1:]  # drop DC
    med = np.median(vals)
    bits = vals > med
    return int(sum(1 << i for i, b in enumerate(bits) if b))


class PHashImage:
    """Perceptual-hash stage: payload → (media_ref, phash).

    Stateless over the module-level ``_DCT_BASIS`` (the 8 KiB basis is
    no reason to reserve actor CPUs — task mode via ``stages/util.py:
    stage`` constructs this per batch, and that is fine HERE; a real
    decode model would move the weight load into ``__init__`` and pass
    ``concurrency=N``)."""

    def __init__(self):
        self._basis = _DCT_BASIS

    def __call__(self, t: pa.Table) -> pa.Table:
        hashes = [
            f"{phash64_from_pixels(pixels_from_payload(p), self._basis):016x}"
            for p in t["payload"].to_pylist()
        ]
        return pa.table({
            "media_ref": t["media_ref"],
            "phash": pa.array(hashes, pa.string()),
        })


def media_phash_census(sf_dir: str):
    """Rows-only query: image-level dedup census via perceptual hash —
    per phash, how many media spans carry it and how many DISTINCT
    media_refs (same ref reused across documents = exact reuse; several
    refs sharing a hash = near-duplicate pixels). Two-level aggregate:
    batch-local (phash, ref) pair dedup → bucketed global pair dedup →
    per-phash distinct-ref count, plus a straight occurrence count —
    only (phash, ref, partial-count) rows shuffle, never payloads, and
    the whole census is ONE bucketed exchange on the hash (shuffle
    stages carry ~2 s fixed latency each — count them)."""
    import pandas as pd

    from ..functions.groups import bucketed_group_apply
    from ..sources.interleaved import (
        read_interleaved_documents,
        synth_read_blocks,
    )
    from .util import stage

    media = media_table_for_documents(
        read_interleaved_documents(
            sf_dir, override_num_blocks=synth_read_blocks(sf_dir)
        )
    )
    hashed = stage(media, PHashImage, batch_size=256, concurrency=None)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.assign(n=1)
            .groupby(["phash", "media_ref"], as_index=False)
            .agg(n=("n", "sum"))
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    pairs = hashed.map_batches(pair_partial, batch_format="pandas")

    def census(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("phash", as_index=False).agg(
            n_images=("n", "sum"), n_refs=("media_ref", "nunique")
        )
        out["n_images"] = out["n_images"].astype(np.int64)
        out["n_refs"] = out["n_refs"].astype(np.int64)
        return out

    out = bucketed_group_apply(pairs, ["phash"], census).materialize()
    if out.count() == 0:
        return pd.DataFrame(
            {"phash": pd.Series([], dtype=str),
             "n_images": pd.Series([], dtype=np.int64),
             "n_refs": pd.Series([], dtype=np.int64)}
        )
    return out
