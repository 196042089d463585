"""Per-partition lineage + checkpoint/resume.

The north rule requires the pipeline to be *resumable from checkpoint
with per-partition lineage records (partition id, doc_id range, row
counts, stage metrics)*. The reference only has dataset-level resume
(skip a whole output dir if it exists, multi_evalutor.py:201-206) and
deterministic shard names (utils/utils.py:445); this generalizes both:

* the corpus is split into deterministic partitions (doc_id ranges —
  at production scale: input file shards / key ranges);
* each partition's output is written ATOMICALLY (temp dir → rename) to
  ``out_dir/part=<id>/``;
* a commit record {partition_id, doc_id_min, doc_id_max, row_count,
  stage, wall_s, status} is appended to ``out_dir/_lineage.jsonl``
  after the rename;
* on restart, committed partitions are skipped (anti-join of the
  partition list against the manifest) — a crashed run repeats at most
  one partition.

Partition outputs also give the downstream reader a partition-pruned
layout (read only ``part=k`` dirs it needs).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

MANIFEST = "_lineage.jsonl"


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _write_partition(ds, tmp_dir: str) -> int:
    """Write one partition's Dataset; returns its row count.

    The north rule names Lance as the checkpoint format; when the
    ``lance`` package is importable the partition is written as a Lance
    dataset (its manifest-per-commit model matches this module's
    atomic-rename + lineage-append protocol one-to-one). This container
    does not ship ``lance``, so the parquet branch runs here — identical
    Arrow schema, same atomicity; the format choice is a sink detail."""
    if _lance_available():  # pragma: no cover - lance absent in container
        import lance

        if hasattr(ds, "write_lance"):
            ds.write_lance(tmp_dir)
        else:
            from itertools import chain

            it = ds.iter_batches(batch_format="pyarrow")
            first = next(it, None)
            if first is None:
                # a legitimately empty partition must still commit:
                # the caller renames tmp_dir unconditionally
                os.makedirs(tmp_dir, exist_ok=True)
                return 0
            lance.write_dataset(chain([first], it), tmp_dir,
                                schema=first.schema)
        return lance.dataset(tmp_dir).count_rows()
    ds.write_parquet(tmp_dir)
    return -1  # parquet branch: caller counts from file metadata


def committed_partitions(out_dir: str) -> dict[int, dict]:
    path = Path(out_dir) / MANIFEST
    done: dict[int, dict] = {}
    if path.exists():
        for line in path.read_text().splitlines():
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                # torn tail line from a crash mid-append: that commit
                # never happened — treat its partition as uncommitted
                # (this module exists to survive exactly such crashes)
                continue
            if rec.get("status") == "committed":
                done[rec["partition_id"]] = rec
    return done


def commit_partition(out_dir: str, record: dict) -> None:
    path = Path(out_dir) / MANIFEST
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
        f.flush()
        os.fsync(f.fileno())


def run_partitioned(partition_ids: list[int], make_ds, out_dir: str,
                    *, stage: str = "extract") -> dict:
    """Run ``make_ds(partition_id) -> Dataset`` for every uncommitted
    partition; write each atomically and commit its lineage record.

    Returns {"ran": [...], "skipped": [...]} partition ids.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = committed_partitions(out_dir)
    ran, skipped = [], []
    for pid in partition_ids:
        if pid in done:
            skipped.append(pid)
            continue
        t0 = time.time()
        ds = make_ds(pid)
        final_dir = Path(out_dir) / f"part={pid}"
        tmp_dir = Path(out_dir) / f"_tmp_part={pid}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        written = _write_partition(ds, str(tmp_dir))
        # gather partition stats from the written files' parquet metadata
        # (row counts + doc_id range from column statistics — no re-read)
        import pyarrow.parquet as pq

        n_rows = max(written, 0)
        doc_min: str | None = None
        doc_max: str | None = None
        for f in tmp_dir.glob("*.parquet"):
            md = pq.read_metadata(f)
            n_rows += md.num_rows
            try:
                ci = md.schema.to_arrow_schema().get_field_index("doc_id")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        continue
                    # compare in the column's NATIVE type: stringifying
                    # first would make numeric ranges lexicographic
                    # (min("2","10") == "10")
                    lo, hi = st.min, st.max
                    doc_min = lo if doc_min is None else min(doc_min, lo)
                    doc_max = hi if doc_max is None else max(doc_max, hi)
            except Exception:
                pass  # stats optional: commit still valid without range
        os.rename(tmp_dir, final_dir)
        from .metrics import dataset_stage_metrics

        commit_partition(
            out_dir,
            {
                "partition_id": pid,
                "stage": stage,
                "doc_id_min": doc_min
                if isinstance(doc_min, (int, float, str, type(None)))
                else str(doc_min),
                "doc_id_max": doc_max
                if isinstance(doc_max, (int, float, str, type(None)))
                else str(doc_max),
                "row_count": n_rows,
                "wall_s": round(time.time() - t0, 3),
                # per-stage latency/row/byte metrics from the executed
                # Dataset (north-star "stage metrics" clause)
                "stage_metrics": dataset_stage_metrics(ds),
                "status": "committed",
            },
        )
        ran.append(pid)
    return {"ran": ran, "skipped": skipped}


def flagship_checkpointed(sf_dir: str, out_dir: str, *,
                          num_partitions: int = 8,
                          concurrency=None) -> dict:
    """The flagship extraction pipeline with per-partition lineage.

    Partitions are doc_id hash classes (``doc_id & (N−1)``, N a power of
    two, pushed down as a parquet scan predicate); each partition reads
    only its slice of the input (at scale: one input shard per
    partition). Resume = rerun with the same ``out_dir``.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..sources.interleaved import _synth_batch
    from ..stages.extract import extract_main_content

    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")

    def make_ds(pid: int):
        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filter=pc.equal(
                pc.bit_wise_and(pc.field("doc_id"), num_partitions - 1), pid
            ),
        )
        inter = docs.map_batches(_synth_batch, batch_format="pyarrow")
        # pass concurrency through VERBATIM: None = task mode (the
        # preferred light-state shape; `or 2` silently forced a 2-actor
        # pool, which equals the whole cluster at num_cpus=2 — the
        # documented reservation deadlock)
        return extract_main_content(inter, concurrency=concurrency)

    return run_partitioned(
        list(range(num_partitions)), make_ds, out_dir, stage="extract"
    )


def read_checkpointed(out_dir: str):
    """Read back all committed partitions as one Dataset (parquet or
    Lance, matching whichever branch ``_write_partition`` took); raises
    a clear FileNotFoundError when nothing has committed yet instead of
    a confusing empty-path read error."""
    import ray.data as rd

    files = sorted(
        str(f) for f in Path(out_dir).glob("part=*/*.parquet")
    )
    if files:
        return rd.read_parquet(files)
    part_dirs = sorted(
        str(d) for d in Path(out_dir).glob("part=*") if d.is_dir()
    )
    if part_dirs and _lance_available():  # pragma: no cover - no lance
        ds = rd.read_lance(part_dirs[0])
        for d in part_dirs[1:]:
            ds = ds.union(rd.read_lance(d))
        return ds
    raise FileNotFoundError(
        f"no committed partitions under {out_dir!r} "
        "(expected part=*/ with parquet or Lance data)"
    )
