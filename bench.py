#!/usr/bin/env python
"""Benchmark harness.

Plain run: execute the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``
(default 32) and print ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

The headline is the flagship main-content extraction over a REPLICATED
copy of the documents table (REP=$GRAFT_BENCH_REP, default 1000 → 5M
docs at sf0.1), materialized once to /tmp as real parquet files so Ray
sizes read tasks from actual bytes. Prep is cached and untimed; both
scaling levels read the identical input.

``--scaling``: run the headline at $GRAFT_SCALE_LO and $GRAFT_SCALE_HI
CPUs (default 4 and 16 — N→4N within the host's physical-core budget;
see BASELINE.md for the 8→32 pair and why SMT caps it) in FRESH
processes on the same input; report docs/sec at both + scaling
efficiency (the north rule's two-cluster-size criterion, evidenced via
two parallelism levels in this single-node sandbox).

Tuning notes (measured, see BASELINE.md):
  * the extraction runs in fused task mode — one task chain
    read→synth→extract per block, no actor pool: pools stall on ramp-up
    for short jobs and reserve CPUs away from the read stage
    (8→32 efficiency was ~0.25 with a pool, 0.93 with fused tasks);
  * ``override_num_blocks = 128`` at the read (FIXED across scaling
    levels so only parallelism varies): the replicated
    input compresses ~50×, so byte-based task sizing would otherwise
    coalesce the whole corpus into a handful of tasks;
  * consumption is a FUSED per-block partial count (one tiny row per
    block summed on the driver): ``Dataset.sum`` / ``materialize`` both
    schedule a second 128-task stage after the map chain, and task
    dispatch on this host is ~40 ms *serial* — the extra stage measured
    +5 s of pure scheduling on a ~10 s job. The count map fuses into
    ``ReadParquet->synth->extract->count`` (one task per block), so the
    aggregate is free.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_value() -> float:
    """Scale factor from the dir name; 0.0 for non-sf-named inputs
    (never crash at report time after the measurement completed)."""
    import re as _re

    m = _re.search(r"sf([0-9.]+)$", SF_DIR.rstrip("/"))
    try:
        return float(m.group(1)) if m else 0.0
    except ValueError:
        return 0.0


NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REP = int(os.environ.get("GRAFT_BENCH_REP", "1000"))


def _bench_input_dir() -> str:
    tag = SF_DIR.rstrip("/").replace("/", "_").lstrip("_")
    # 128 files: one read task per file, so the read FUSES with the
    # synth+extract chain (64 files + override 128 forced a SplitBlocks
    # hop through the object store)
    return f"/tmp/graft_bench_input_{tag}_rep{REP}_128f"


def _prepare_bench_input() -> str:
    """Materialize the replicated documents table once (cached)."""
    out_dir = _bench_input_dir()
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return out_dir

    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def replicate(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                t.set_column(
                    0, "doc_id", pc.add(t["doc_id"], k * 1_000_000)
                )
                for k in range(REP)
            ]
        )

    shutil.rmtree(out_dir, ignore_errors=True)
    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=64,
    )
    ds.map_batches(replicate, batch_format="pyarrow").repartition(
        128
    ).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _count_rows(parquet_dir: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(f"{parquet_dir}/*.parquet")
    )


def _headline_consume(out):
    """Fused-count consumption of the flagship extraction.

    Appends a per-block partial-count map (fuses with the upstream
    read→synth→extract tasks — still ONE task per block) and sums the
    128 tiny rows on the driver. Avoids the second full-dataset stage
    that ``Dataset.sum``/``materialize`` schedule (~40 ms serial
    dispatch × 128 tasks ≈ +5 s measured on this host).

    Returns (counts_dataset, n_rows, total_spans); the counts dataset
    handle carries the executed plan's stats.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def _partial_count(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rows": [b.num_rows],
                "spans": [pc.sum(b["n_spans"]).as_py()],
            }
        )

    counts = out.map_batches(
        _partial_count, batch_format="pyarrow", batch_size=None
    )
    rows = spans = 0
    for b in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows += int(pc.sum(b["rows"]).as_py())
        spans += int(pc.sum(b["spans"]).as_py())
    return counts, rows, spans


def _consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += b.num_rows
    return n


def _quiesce(max_wait: float = 180.0, target: float = 2.0) -> None:
    """Bounded wait for co-tenant load to drain before measuring.

    The sandbox host is shared: load spikes from other tenants inflate
    identical runs 2-3x (documented band in BASELINE.md). Waiting a
    bounded couple of minutes for loadavg to drop costs nothing when the
    host is quiet and rescues the measurement when it isn't."""
    t0 = time.time()
    while time.time() - t0 < max_wait and os.getloadavg()[0] > target:
        time.sleep(5)


def run_benchmarks() -> dict:
    import ray

    _quiesce()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import ray.data as rd

    from docling_eval_ray.pipelines import relational as r
    from docling_eval_ray.sources.interleaved import _synth_batch
    from docling_eval_ray.stages.dedup import (
        minhash_near_dups,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from docling_eval_ray.pipelines.evaluate import (
        corpus_layout_map,
        evaluate_markdown,
        evaluation_summary,
    )
    from docling_eval_ray.stages.extract import extract_main_content
    from docling_eval_ray.stages.knn import (
        embedding_knn,
        embedding_knn_ivf,
        embedding_label_medoid,
        embedding_near_dups,
        knn_hard_negatives,
        label_centroids,
        pq_knn,
        sq8_knn,
    )
    from docling_eval_ray.stages.sketches import (
        events_type_p99_tdigest,
        events_value_tdigest,
        token_count_min as _token_count_min,
    )
    from docling_eval_ray.pipelines import cleaning as cl
    from docling_eval_ray.pipelines.pretrain import (
        training_data_pipeline as tdp,
    )
    from docling_eval_ray.pipelines import corpus_ops as co
    from docling_eval_ray.stages.media import media_decode_stats
    from docling_eval_ray.stages.audio import (
        audio_feature_stats as _audio_feature_stats,
        audio_fingerprint_census as _audio_fingerprint_census,
    )
    from docling_eval_ray.stages.knn import (
        label_pca_component as _label_pca_component,
    )
    from docling_eval_ray.stages.bloom import (
        decontaminate_bloom as _decontaminate_bloom,
    )
    from docling_eval_ray.stages.dedup import (
        dedup_substrings_excise as _dedup_substrings_excise,
        minhash_jaccard_calibration as _minhash_jaccard_calibration,
        near_dup_clusters_star as _near_dup_clusters_star,
        substring_dup_stats as _substring_dup_stats,
    )
    from docling_eval_ray.stages.knn import (
        sq8_recall_at_k as _sq8_recall_at_k,
    )
    from docling_eval_ray.stages.knn import (
        embedding_near_dups_lsh as _embedding_near_dups_lsh,
    )

    bench_input = _prepare_bench_input()

    # warm the page cache (measure compute + shuffle, not first-touch IO)
    for f in glob.glob(f"{SF_DIR}/*.parquet") + glob.glob(
        f"{bench_input}/*.parquet"
    ):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    timings: dict[str, float] = {}

    # --- headline: flagship extraction over the replicated corpus -------
    t0 = time.time()
    ds = rd.read_parquet(bench_input, override_num_blocks=128)
    # batch_size=None → per-block batches. The default 1024-row batcher
    # re-slices and re-concatenates every upstream block; on big blocks
    # the slice+concat glue dominated the UDFs (measured 10x the wall at
    # 156k-row blocks). Per-block batches make per-span cost flat.
    inter = ds.map_batches(
        _synth_batch, batch_format="pyarrow", batch_size=None
    )
    out = extract_main_content(inter, batch_size=None)  # fused task mode
    counts, _rows, total_spans = _headline_consume(out)
    headline = time.time() - t0
    n_docs = _count_rows(bench_input)
    timings["flagship_extraction"] = round(headline, 3)
    # per-stage latency of the headline run (north-star metrics clause);
    # the counts handle carries the executed fused plan's stats
    from docling_eval_ray.state.metrics import dataset_stage_metrics

    stage_latency = dataset_stage_metrics(counts)
    del counts

    # --- representative operator pipelines (raw sf tables) ---------------
    for name, fn in [
        ("q1_pricing_summary", r.q1_pricing_summary),
        ("revenue_by_nation", r.revenue_by_nation),
        ("top2_orders_per_customer", r.top2_orders_per_customer),
        ("events_hourly", r.events_hourly),
        ("user_sessions", r.user_sessions),
        ("dedup_exact", r.dedup_exact),
        ("ngram_jaccard_pairs", ngram_jaccard_pairs),
        ("minhash_near_dups", minhash_near_dups),
        ("embedding_knn", embedding_knn),
        ("embedding_near_dups", embedding_near_dups),
        ("embedding_knn_ivf", embedding_knn_ivf),
        ("evaluate_markdown", evaluate_markdown),
        ("corpus_layout_map", corpus_layout_map),
        ("media_decode_stats", media_decode_stats),
        ("audio_feature_stats", _audio_feature_stats),
        ("quality_repetition", co.quality_repetition),
        ("tfidf_topk", co.tfidf_topk),
        ("token_heavy_hitters", co.token_heavy_hitters),
        ("pack_sequences", co.pack_sequences),
        ("kmeans_assign", co.kmeans_assign),
        ("pii_redact", cl.pii_redact),
        ("dedup_paragraphs", cl.dedup_paragraphs),
        ("lm_perplexity", cl.lm_perplexity),
        ("events_running_total", r.events_running_total),
        ("gopher_quality_filter", cl.gopher_quality_filter),
        ("events_interarrival", r.events_interarrival),
        ("label_centroids", label_centroids),
        ("training_data_pipeline", tdp),
        ("funnel_conversion", r.funnel_conversion),
        ("cohort_retention", r.cohort_retention),
        ("token_pmi_bigrams", r.token_pmi_bigrams),
        ("top_event_type_per_user", r.top_event_type_per_user),
        ("decontaminate_bloom", _decontaminate_bloom),
        ("order_percent_rank", r.order_percent_rank),
        ("priority_line_counts", r.priority_line_counts),
        ("event_transitions", r.event_transitions),
        ("mixture_resample_census", co.mixture_resample_census),
        ("events_rolling_median", r.events_rolling_median),
        ("part_cooccurrence", r.part_cooccurrence),
        ("customer_spend_quartiles", r.customer_spend_quartiles),
        ("daily_active_users", r.daily_active_users),
        ("ngram_containment_pairs", ngram_containment_pairs),
        ("embedding_label_medoid", embedding_label_medoid),
        ("events_value_tdigest", events_value_tdigest),
        ("events_type_p99_tdigest", events_type_p99_tdigest),
        ("weighted_sample_topk", co.weighted_sample_topk),
        ("orders_without_lineitems_bloom",
         r.orders_without_lineitems_bloom),
        ("table_profile", r.table_profile),
        ("large_quantity_orders", r.large_quantity_orders),
        ("events_in_windows_distributed", r.events_in_windows_distributed),
        ("label_pca_component", _label_pca_component),
        ("audio_fingerprint_census", _audio_fingerprint_census),
        # scale tiers forced past their size-routing gates, so the
        # distributed paths get recorded wall-times (not just tests):
        # tier-C MinHash verify = full shingle-table joins, no broadcast
        ("minhash_near_dups_scaletier",
         lambda sf: minhash_near_dups(sf, cand_filter_max=0,
                                      cand_index_max=0)),
        # IVF near-dup tier (dynamic cells + skew re-split), no exact
        # broadcast
        ("embedding_near_dups_ivf_tier",
         lambda sf: embedding_near_dups(sf, exact_max=0)),
        # two-level per-class mAP reduce (detection-dominant class path)
        ("corpus_layout_map_sharded",
         lambda sf: corpus_layout_map(sf, class_shards=8)),
        # fused single-pass consolidation (no records materialize)
        ("evaluation_summary", evaluation_summary),
        # round-4 additions: star CC (O(log n) rounds), substring-window
        # census + ExactSubstr excision, hyperplane-LSH near-dups
        ("near_dup_clusters_star", _near_dup_clusters_star),
        ("substring_dup_stats", _substring_dup_stats),
        ("dedup_substrings_excise", _dedup_substrings_excise),
        ("embedding_near_dups_lsh", _embedding_near_dups_lsh),
        # round-5 continuation: SemDeDup cluster-then-prune + DSIR
        ("semdedup_prune", co.semdedup_prune),
        ("dsir_weights", co.dsir_weights),
        # round-5 continuation 2: contrastive mining, quantized ANN,
        # CCNet terciles, shingle novelty (zipf_fit is census-bound and
        # sub-second — covered by the oracle gate, not benched)
        ("knn_hard_negatives", knn_hard_negatives),
        ("sq8_knn", sq8_knn),
        ("pq_knn", pq_knn),
        ("perplexity_buckets", cl.perplexity_buckets),
        ("ngram_novelty", co.ngram_novelty),
        # round-5 continuation 3: entropy banding census, SQ8 recall
        # gate, MinHash estimator calibration (mmr_diverse_topk and
        # zipf_fit are census-bound sub-second ops — oracle-gated only)
        ("char_entropy_quality", co.char_entropy_quality),
        ("sq8_recall_at_k", _sq8_recall_at_k),
        ("minhash_jaccard_calibration", _minhash_jaccard_calibration),
        # round-5 continuation 4: backoff LM + subsampling CI (the
        # kappa/KS/truncation/classifier censuses over the 5k-doc table
        # are sub-second — oracle-gated only)
        ("lm_perplexity_bigram", cl.lm_perplexity_bigram),
        ("subsample_ci_mean", co.subsample_ci_mean),
        # round-5 continuation 5: CM-sketch calibration (corpus scan +
        # vocab groupby), cross-split shingle leakage (gram exchange),
        # fused LM×quality Pearson census, content-hash dedup savings,
        # per-user bitmask overlap (rrf_fusion / k_anonymity_census /
        # classifier_reliability_bins are census-bound sub-second ops —
        # oracle-gated only)
        ("token_count_min", _token_count_min),
        ("split_contamination_audit", co.split_contamination_audit),
        ("quality_perplexity_corr", co.quality_perplexity_corr),
        ("dedup_inflation_by_source", r.dedup_inflation_by_source),
        ("event_type_user_overlap", r.event_type_user_overlap),
    ]:
        t0 = time.time()
        out = fn(SF_DIR)
        _consume(out) if hasattr(out, "iter_batches") else None
        timings[name] = round(time.time() - t0, 3)

    ray.shutdown()
    sf = _sf_value()
    compact = {
        "metric": "flagship extraction wall time (+ operator suite)",
        "value": round(headline, 3),
        "unit": "sec",
        # per-op seconds rounded to 2dp: the driver captures only a tail
        # window of stdout — round 3's full-precision line plus
        # stage_latency overflowed it (BENCH_r03 parsed: null)
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "total_spans": int(total_spans),
        "docs_per_sec": round(n_docs / headline, 1) if headline else None,
        "n_ops": len(timings),
        "detail_file": "BENCH_DETAIL.json",
    }
    # full detail (per-stage latency breakdown, full-precision timings)
    # goes to a sidecar next to this script, NOT the stdout line
    detail = dict(compact, queries=timings, stage_latency=stage_latency)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout line still carries the suite
    return compact


def run_scaling() -> dict:
    """Same input, two parallelism levels, fresh processes.

    Best-of-2 per level: the sandbox host is shared (load spikes from
    other tenants were observed to inflate identical runs ~2×), so the
    minimum is the closest observable to the machine's true capacity.
    """
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def quiesce(max_wait: float = 120.0) -> None:
        # wait (bounded) for background load to drain so the measurement
        # reflects the pipeline, not co-tenant noise
        t0 = time.time()
        while time.time() - t0 < max_wait and os.getloadavg()[0] > 8.0:
            time.sleep(5)

    # interleave attempts (lo,hi,lo,hi) so both levels sample the same
    # noise windows, then take the per-level best — back-to-back pairs
    # of the same level can both land in a co-tenant load spike and
    # produce nonsense ratios (observed 0.63..1.45 on this host)
    attempts: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(2):
        for level in (lo, hi):
            quiesce()
            attempts[level].append(run_once(level))

    def best(level: int) -> dict:
        return min(attempts[level], key=lambda r: r["value"])

    r_lo = best(lo)
    r_hi = best(hi)
    speedup = r_lo["value"] / r_hi["value"] if r_hi["value"] else 0.0
    eff = speedup / (hi / lo)
    return {
        "metric": "scaling efficiency (flagship extraction)",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
        "n_docs": r_hi["n_docs"],
    }


def run_headline_only() -> dict:
    import ray

    _quiesce()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import ray.data as rd

    from docling_eval_ray.sources.interleaved import _synth_batch
    from docling_eval_ray.stages.extract import extract_main_content

    bench_input = _prepare_bench_input()
    for f in glob.glob(f"{bench_input}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    # warm the worker pool (untimed): spawning N python workers costs
    # seconds and would bias the higher parallelism level
    rd.range(NUM_CPUS * 1000, override_num_blocks=NUM_CPUS).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    t0 = time.time()
    ds = rd.read_parquet(bench_input, override_num_blocks=128)
    # batch_size=None → per-block batches. The default 1024-row batcher
    # re-slices and re-concatenates every upstream block; on big blocks
    # the slice+concat glue dominated the UDFs (measured 10x the wall at
    # 156k-row blocks). Per-block batches make per-span cost flat.
    inter = ds.map_batches(
        _synth_batch, batch_format="pyarrow", batch_size=None
    )
    out = extract_main_content(inter, batch_size=None)
    _counts, _rows, total_spans = _headline_consume(out)
    headline = time.time() - t0
    ray.shutdown()
    n_docs = _count_rows(bench_input)
    return {
        "value": round(headline, 3),
        "docs_per_sec": round(n_docs / headline, 1),
        "n_docs": n_docs,
        "total_spans": int(total_spans),
        "sf": _sf_value(),
        "num_cpus": NUM_CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--headline-only" in sys.argv:
        print(json.dumps(run_headline_only()))
    else:
        print(json.dumps(run_benchmarks()))
