"""Main-content extraction — the flagship stage.

Re-expresses the reference's document "conversion" step (a stateful
per-document model pipeline, docling_eval/prediction_providers/
docling_provider.py:85-115, invoked row-at-a-time in a single-process
loop, base_prediction_provider.py:354-376) as a **stateful actor-pool
``map_batches`` stage over zero-copy Arrow batches**:

  * strips page furniture spans (``page_header``/``page_footer`` — the
    reference's content-layer / label-subset filtering,
    markdown_text_evaluator.py:83-105),
  * strips boilerplate text spans via link-density + text-density
    heuristics (Readability/boilerpipe-style scoring, public heuristics),
  * normalizes whitespace (the reference's text normalizers, e.g.
    dpbench_builder.py:154),
  * preserves media spans as ``media_ref`` placeholders interleaved in
    document order, and
  * renumbers ``offset`` 0..n-1 so the output satisfies the span-sequence
    invariant ``(kind, text, media_ref, order)``.

Everything is vectorized: span lists are flattened once per batch
(``ListArray.flatten`` + ``list_parent_indices``), all scoring runs as
``pyarrow.compute`` / numpy kernels over the flat arrays, and the list
structure is rebuilt from kept-counts — no Python loop over rows or spans.

Per-row failures are trapped into a ``status`` column (skip-and-count,
reference base_prediction_provider.py:366-376) so Ray task retries never
loop on a poisoned row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..datamodel.schema import FURNITURE_KINDS, SPAN_STRUCT

#: a "text-like" span is subject to boilerplate scoring; structural spans
#: (title, headers, captions, media, ...) are kept on kind alone
_SCORED_KINDS = ("text", "paragraph")

#: link-density threshold: fraction of separator tokens ("|", a stand-in
#: for anchor density in pre-parsed span text) above which a text span is
#: considered navigation boilerplate
LINK_DENSITY_MAX = 0.25


class ExtractMainContent:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    State (kind dictionaries as Arrow value sets) is built once per actor
    in ``__init__``; ``__call__`` is pure per-batch compute.
    """

    def __init__(
        self,
        furniture_kinds: tuple[str, ...] = FURNITURE_KINDS,
        link_density_max: float = LINK_DENSITY_MAX,
    ) -> None:
        self._furniture = pa.array(list(furniture_kinds), pa.string())
        self._scored = pa.array(list(_SCORED_KINDS), pa.string())
        self._ld_max = link_density_max

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            return self._extract(batch, status="success")
        except Exception:  # poisoned batch: keep rows, mark failure
            n = batch.num_rows
            empty = pa.ListArray.from_arrays(
                pa.array([0] * (n + 1), pa.int32()),
                pa.array([], SPAN_STRUCT),
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "spans": empty,
                    "n_spans": pa.array([0] * n, pa.int32()),
                    "status": pa.array(["failure"] * n, pa.string()),
                }
            )

    # ------------------------------------------------------------------
    def _extract(self, batch: pa.Table, status: str) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        if isinstance(spans, pa.ChunkedArray):  # single-chunk guarantee
            spans = spans.chunk(0)
        n_rows = len(spans)

        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)

        kinds = flat.field("kind")
        texts = flat.field("text")
        media = flat.field("media_ref")

        # 1. whitespace normalization. split+join+trim is exactly equal
        #    to the spec's regex form trim(replace(r"\s+", " ")) — RE2's
        #    \s is the same ASCII whitespace set ascii_split_whitespace
        #    splits on, and the final unicode trim covers the edges both
        #    ways — at 2.8x the throughput (regex was ~21% of headline
        #    extraction CPU).
        norm = pc.utf8_trim_whitespace(
            pc.binary_join(pc.ascii_split_whitespace(texts), " ")
        )

        # 2. furniture strip
        keep = pc.invert(pc.is_in(kinds, value_set=self._furniture))

        # 3. boilerplate scoring on text-like spans: link density =
        #    separator tokens / total tokens
        n_sep = pc.count_substring(norm, "|")
        n_tok = pc.add(pc.count_substring(norm, " "), 1)
        link_density = pc.divide(
            pc.cast(n_sep, pa.float64()), pc.cast(n_tok, pa.float64())
        )
        is_scored = pc.is_in(kinds, value_set=self._scored)
        not_boiler = pc.or_(
            pc.invert(is_scored), pc.less(link_density, self._ld_max)
        )
        keep = pc.and_(keep, not_boiler)

        # 4. drop spans that are empty after normalization and carry no media
        non_empty = pc.or_(
            pc.greater(pc.utf8_length(norm), 0), pc.not_equal(media, "")
        )
        keep = pc.and_(keep, non_empty)

        keep_np = keep.to_numpy(zero_copy_only=False)
        kept_parent = parent[keep_np]

        # 5. rebuild per-document lists + contiguous offsets
        counts = np.bincount(kept_parent, minlength=n_rows)
        new_list_offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(counts, out=new_list_offsets[1:])
        total = int(new_list_offsets[-1])
        # position within each list = global index − list start
        new_span_offsets = (
            np.arange(total, dtype=np.int32)
            - np.repeat(new_list_offsets[:-1], counts).astype(np.int32)
        )

        struct = pa.StructArray.from_arrays(
            [
                kinds.filter(keep),
                norm.filter(keep),
                media.filter(keep),
                pa.array(new_span_offsets, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        )
        out_spans = pa.ListArray.from_arrays(
            pa.array(new_list_offsets, pa.int32()), struct
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "spans": out_spans,
                "n_spans": pa.array(counts.astype(np.int32), pa.int32()),
                "status": pa.array([status] * n_rows, pa.string()),
            }
        )


def default_pool_size() -> int:
    """Actor-pool size that leaves headroom for read/write task stages.

    An actor pool sized to ALL cluster CPUs starves the stateless read
    tasks and deadlocks the streaming executor (observed in local mode:
    4 actors on num_cpus=4 → no CPU left for ReadParquet). Reserve 2
    CPUs for the task stages.
    """
    import ray

    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(1, total - 2)


def add_size_bucket(ds):
    """Append a log2 size class computed from the span count — the cheap
    pre-pass that skew handling keys on (reference skew is unhandled: a
    500-page PDF blocks its whole loop, SURVEY.md §4)."""

    def fn(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(t["spans"])
        bucket = pc.cast(
            pc.floor(
                pc.logb(pc.cast(pc.add(n, 1), pa.float64()), 2)
            ),
            pa.int8(),
        )
        return t.append_column("size_bucket", bucket)

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_skew_aware(
    ds,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
):
    """Skew-aware extraction: size-bucket the documents and process the
    heaviest buckets FIRST (LPT scheduling — the range shuffle groups
    similar-cost rows into the same blocks, and descending order keeps a
    straggler from landing at the tail), with a smaller batch so the
    work-stealing scheduler can level load across the actor pool."""
    bucketed = add_size_bucket(ds)
    ordered = bucketed.sort("size_bucket", descending=True)
    return extract_main_content(
        ordered, concurrency=concurrency, batch_size=batch_size
    )


def extract_main_content(
    ds,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """Apply main-content extraction.

    ``concurrency=None`` (default) → stateless-task mode: the transform
    FUSES with the upstream read/synth tasks (no extra object-store hop)
    and is fully elastic — measured 0.93 scaling efficiency 8→32 CPUs,
    where a dedicated actor pool stalled on ramp-up for short jobs and
    reserved CPUs away from the read stage.

    ``batch_size=None`` (default) → per-block batches: every kernel here
    is flat in batch size, and Ray's fixed-size batcher re-slices and
    re-concatenates upstream blocks (list-of-struct columns make that
    glue DOMINATE the real work on large blocks — measured 10x wall at
    156k-row blocks vs per-block batches). Set a batch size only for
    actor pools that need work-stealing granularity.

    Pass an int/tuple for an actor pool when per-actor state becomes
    expensive (real layout/OCR models): then size ``concurrency ×
    num_cpus`` to the node and leave ≥2 CPUs for the task stages
    (see ``default_pool_size``).

    Model-backed sizing guide (the reference pins its converter to an
    internal ``num_threads=16`` thread pool,
    prediction_providers/docling_provider.py:78-115): give each actor
    the model's thread budget via ``map_batches(..., num_cpus=T)`` so
    Ray's scheduler accounts for the pool's REAL footprint —
    ``concurrency = (node_cpus - 2) // T`` actors of ``num_cpus=T``
    each, e.g. a 32-CPU node with a 16-thread model runs 1 actor +
    16 reserved task CPUs, or 2×8-thread actors. Under-declaring
    ``num_cpus=1`` for a 16-thread model oversubscribes the node 16×
    and collapses the scaling curve.
    """
    from .util import stage

    return stage(
        ds,
        ExtractMainContent,
        batch_size=batch_size,
        concurrency=concurrency,
    )
