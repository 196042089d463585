"""CLI — the reference's verb surface (cli/main.py:841-1083) on Ray Data.

    python -m docling_eval_ray create-gt   --sf-dir D --output O
    python -m docling_eval_ray create-eval --sf-dir D --output O [--partitions N]
    python -m docling_eval_ray create      --sf-dir D --output O  (gt + eval)
    python -m docling_eval_ray create-cvat --sf-dir D --output O [--buckets N]
    python -m docling_eval_ray run-flagship --sf-dir D --output O [--partitions N]
    python -m docling_eval_ray evaluate    --sf-dir D --output O [--modality M ...]
    python -m docling_eval_ray visualize   --output O [--modality M ...]
    python -m docling_eval_ray create-sliced --sf-dir D --output O
                                             [--slice-length K --overlap V]

Owns its Ray session (unlike the library): init on start, shutdown on
exit.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session() -> bool:
    """Init Ray if needed; returns True iff WE started it (and should
    shut it down — never tear down a caller's session)."""
    import ray

    started = not ray.is_initialized()
    if started:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return started


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="docling_eval_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    for cmd in ("create-gt", "create-eval", "evaluate", "create-sliced",
                "run-flagship", "create", "create-cvat"):
        sp = sub.add_parser(cmd)
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--output", required=True)
        if cmd in ("create-eval", "run-flagship", "create"):
            sp.add_argument("--partitions", type=int, default=8)
        if cmd == "create-cvat":
            sp.add_argument("--buckets", type=int, default=2)
        if cmd == "evaluate":
            sp.add_argument("--modality", action="append", default=None)
        if cmd == "create-sliced":
            sp.add_argument("--slice-length", type=int, default=8)
            sp.add_argument("--overlap", type=int, default=2)

    vp = sub.add_parser("visualize")
    vp.add_argument("--output", required=True)
    vp.add_argument("--modality", action="append", default=None)
    vp.add_argument("--html", action="store_true",
                    help="also write per-doc comparison HTML (S11)")
    vp.add_argument("--png", action="store_true",
                    help="also write per-doc comparison PNG pages "
                         "(S11; from-scratch stdlib codec)")
    vp.add_argument("--overlay", action="store_true",
                    help="also write per-doc image-underlay overlay "
                         "pages (GT + prediction boxes over the page "
                         "image; visualisations.py:79-226 analogue)")
    vp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = p.parse_args(argv)

    if args.cmd == "visualize" and (args.html or args.png
                                    or args.overlay):
        started = _ray_session()
        import ray

        try:
            from .pipelines.evaluate import eval_records

            counts = {}
            if args.html:
                from .functions.viz import write_comparison_html

                counts["html_files"] = write_comparison_html(
                    eval_records(args.sf_dir), f"{args.output}/html"
                ).count()
            if args.png:
                from .functions.viz import write_comparison_png

                counts["png_files"] = write_comparison_png(
                    eval_records(args.sf_dir), f"{args.output}/png"
                ).count()
            if args.overlay:
                from .functions.viz import write_overlay_html

                counts["overlay_files"] = write_overlay_html(
                    eval_records(args.sf_dir), f"{args.output}/overlay"
                ).count()
            print(json.dumps(counts))
        finally:
            if started:
                ray.shutdown()

    if args.cmd == "visualize":
        # re-reads cached evaluation JSON; no Ray needed
        from pathlib import Path

        from .functions.viz import ascii_histogram, render_table, stats_to_table

        for f in sorted(Path(args.output).glob("evaluation_*.json")):
            modality = f.stem.replace("evaluation_", "")
            if args.modality and modality not in args.modality:
                continue
            summary = json.loads(f.read_text())
            for metric, stats in sorted(summary.get("metrics", {}).items()):
                print(f"== {modality} / {metric} ==")
                table, headers = stats_to_table(stats, metric)
                print(render_table(table, headers))
                print(ascii_histogram(stats))
        return 0

    if args.cmd == "create":
        # the reference's combined verb (cli/main.py create = gt + eval):
        # each sub-verb manages its own Ray session
        rc = main(["create-gt", "--sf-dir", args.sf_dir,
                   "--output", f"{args.output}/gt"]) or 0
        rc2 = main(["create-eval", "--sf-dir", args.sf_dir,
                    "--output", f"{args.output}/eval",
                    "--partitions", str(args.partitions)]) or 0
        return rc or rc2

    started = _ray_session()
    import ray

    try:
        if args.cmd == "create-gt":
            from .sources.files import write_dataset_info
            from .sources.interleaved import read_interleaved_documents

            # data under <output>/data so the manifest JSON never breaks
            # a read_parquet over the dataset directory
            ds = read_interleaved_documents(args.sf_dir)
            ds.write_parquet(f"{args.output}/data")
            info = write_dataset_info(
                args.output, "gt", ray.data.read_parquet(f"{args.output}/data")
            )
            print(json.dumps(info))
        elif args.cmd == "create-eval":
            from .state.lineage import flagship_checkpointed

            res = flagship_checkpointed(
                args.sf_dir, args.output, num_partitions=args.partitions
            )
            print(json.dumps(res))
        elif args.cmd == "create-cvat":
            # export the GT corpus as CVAT pre-annotation task files
            # (reference create-cvat verb): per-span line boxes are
            # synthesized deterministically from span order (the PDF
            # raster that supplies true geometry is stubbed here)
            import pyarrow as pa
            import pyarrow.compute as pc

            from .sources.cvat import write_cvat_preannotations
            from .sources.interleaved import read_interleaved_documents

            def add_boxes(t: pa.Table) -> pa.Table:
                # arrow-native: pandas round-trips mangle the spans
                # list<struct> column into unconvertible object arrays
                lens = pc.list_value_length(t["spans"]).to_pylist()
                boxes = [
                    [{"l": 5.0, "t": 5.0 + i * 12.0,
                      "r": 605.0, "b": 14.0 + i * 12.0}
                     for i in range(int(n or 0))]
                    for n in lens
                ]
                return t.select(["doc_id", "spans"]).append_column(
                    "boxes", pa.array(boxes)
                )

            ds = read_interleaved_documents(args.sf_dir).map_batches(
                add_boxes, batch_format="pyarrow"
            )
            receipts = write_cvat_preannotations(
                ds, f"{args.output}/cvat", num_buckets=args.buckets
            ).to_pandas()
            print(json.dumps({
                "tasks": len(receipts),
                "n_images": int(receipts["n_images"].sum()),
            }))
        elif args.cmd == "run-flagship":
            # the `ray job submit` entrypoint shape: run the flagship
            # with lineage checkpointing, then emit the job-level
            # throughput + per-stage latency report (north-star clause;
            # on a real cluster: ray job submit -- python -m
            # docling_eval_ray run-flagship --sf-dir ... --output ...)
            import time as _time

            from .state.lineage import (
                committed_partitions,
                flagship_checkpointed,
            )
            from .state.metrics import merge_stage_metrics

            t0 = _time.time()
            res = flagship_checkpointed(
                args.sf_dir, args.output, num_partitions=args.partitions
            )
            wall = _time.time() - t0
            recs = committed_partitions(args.output)
            # throughput and stage latency cover ONLY the partitions this
            # run executed — a resume that skips everything must report
            # 0 rows/sec, not the previous run's work over ~0 wall time
            ran_recs = [recs[p] for p in res["ran"] if p in recs]
            rows_ran = sum(r.get("row_count", 0) for r in ran_recs)
            print(json.dumps({
                "ran": res["ran"],
                "skipped": res["skipped"],
                "rows": rows_ran,
                "rows_total_committed": sum(
                    r.get("row_count", 0) for r in recs.values()
                ),
                "wall_s": round(wall, 3),
                "rows_per_sec": (
                    round(rows_ran / wall, 1) if wall > 0 else None
                ),
                "stage_latency": merge_stage_metrics(
                    [r.get("stage_metrics", []) for r in ran_recs]
                ),
            }))
        elif args.cmd == "evaluate":
            from .pipelines.orchestrate import (
                consolidate,
                run_all_evaluations,
                write_consolidation_workbook,
            )

            results = run_all_evaluations(
                args.sf_dir, args.output, modalities=args.modality
            )
            df = consolidate(results)
            wb = write_consolidation_workbook(df, args.output)
            print(df.to_string(index=False))
            print(json.dumps({"workbook": wb}))
        elif args.cmd == "create-sliced":
            from .stages.slicer import sliced_documents

            ds = sliced_documents(
                args.sf_dir,
                slice_length=args.slice_length,
                overlap=args.overlap,
            )
            ds.write_parquet(args.output)
            print(json.dumps({"slices": ds.count()}))
    finally:
        if started:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
