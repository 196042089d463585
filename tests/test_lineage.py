"""Per-partition lineage: atomic partition writes, resume skips
committed partitions, crash replay repeats only the missing one."""

import json
import shutil
from pathlib import Path

from docling_eval_ray.state.lineage import (
    MANIFEST,
    committed_partitions,
    flagship_checkpointed,
    read_checkpointed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_checkpointed_run_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "ckpt")
    res1 = flagship_checkpointed(SF_DIR, out, num_partitions=8)
    assert sorted(res1["ran"]) == list(range(8))
    assert res1["skipped"] == []

    manifest = committed_partitions(out)
    assert len(manifest) == 8
    assert sum(m["row_count"] for m in manifest.values()) == 500
    assert all(m["wall_s"] > 0 and m["stage"] == "extract"
               for m in manifest.values())

    # full resume: nothing to do
    res2 = flagship_checkpointed(SF_DIR, out, num_partitions=8)
    assert res2["ran"] == [] and sorted(res2["skipped"]) == list(range(8))

    # read-back covers the whole corpus with the prediction schema
    ds = read_checkpointed(out)
    assert ds.count() == 500
    # hive-style dirs surface the partition id as a `part` column
    assert set(ds.schema().names) == {
        "doc_id", "spans", "n_spans", "status", "part"
    }


def test_crash_replay_repeats_only_missing_partition(ray_session, tmp_path):
    out = str(tmp_path / "ckpt2")
    flagship_checkpointed(SF_DIR, out, num_partitions=4)

    # simulate a crash that lost partition 2's commit + data
    lines = [
        json.loads(l)
        for l in (Path(out) / MANIFEST).read_text().splitlines()
    ]
    kept = [l for l in lines if l["partition_id"] != 2]
    (Path(out) / MANIFEST).write_text(
        "\n".join(json.dumps(l) for l in kept) + "\n"
    )
    shutil.rmtree(Path(out) / "part=2")

    res = flagship_checkpointed(SF_DIR, out, num_partitions=4)
    assert res["ran"] == [2]
    assert sorted(res["skipped"]) == [0, 1, 3]
    assert read_checkpointed(out).count() == 500


def test_stage_metrics_parser():
    from docling_eval_ray.state.metrics import (
        merge_stage_metrics,
        parse_dataset_stats,
    )

    text = """Operator 1 ReadParquet->SplitBlocks(8): 1 tasks executed, 8 blocks produced in 0.28s
* Remote wall time: 269.05us min, 9.23ms max, 1.52ms mean, 12.16ms total
* Output num rows per block: 62 min, 63 max, 62 mean, 500 total
* Output size bytes per block: 992 min, 1008 max, 1000 mean, 8000 total
* Operator throughput:
\t* Ray Data throughput: 1799.42 rows/s

Operator 2 MapBatches(<lambda>): 8 tasks executed, 8 blocks produced in 0.6s
* Output num rows per block: 62 min, 63 max, 62 mean, 500 total
* Output size bytes per block: 992 min, 1008 max, 1000 mean, 8000 total
* Operator throughput:
\t* Ray Data throughput: 838.30 rows/s

Dataset throughput:
\t* Ray Data throughput: 506.36 rows/s
"""
    text += """
Operator 3 Aggregate: executed in 2.51s

\tSuboperator 0 AggregateMap: 1 tasks executed, 8 blocks produced
\t* Output num rows per block: 10 min, 12 max, 11 mean, 90 total

\tSuboperator 1 AggregateReduce: 4 tasks executed, 4 blocks produced
\t* Output num rows per block: 1 min, 2 max, 1 mean, 6 total
"""
    rows = parse_dataset_stats(text)
    assert [r["stage"] for r in rows] == [
        "ReadParquet->SplitBlocks(8)", "MapBatches(<lambda>)", "Aggregate"
    ]
    assert rows[0] == {
        "stage": "ReadParquet->SplitBlocks(8)", "tasks": 1, "blocks": 8,
        "wall_s": 0.28, "rows_out": 500, "bytes_out": 8000,
        "rows_per_s": 1799.42,
    }
    # all-to-all header: wall captured, rows from the LAST suboperator
    # (the output side), tasks/blocks stay None
    assert rows[2]["wall_s"] == 2.51
    assert rows[2]["rows_out"] == 6
    assert rows[2]["tasks"] is None
    merged = merge_stage_metrics([rows, rows])
    by_name = {m["stage"]: m for m in merged}
    assert by_name["MapBatches(<lambda>)"]["tasks"] == 16
    assert by_name["MapBatches(<lambda>)"]["rows_out"] == 1000
    assert abs(by_name["MapBatches(<lambda>)"]["wall_s"] - 1.2) < 1e-9
    assert by_name["MapBatches(<lambda>)"]["rows_per_s"] > 0
    # unreported fields merge to None, never a fake 0
    assert by_name["Aggregate"]["tasks"] is None
    assert by_name["Aggregate"]["bytes_out"] is None
    assert by_name["Aggregate"]["rows_out"] == 12


def test_lineage_records_stage_metrics(ray_session, tmp_path):
    out = str(tmp_path / "ckpt_metrics")
    flagship_checkpointed(SF_DIR, out, num_partitions=2)
    manifest = committed_partitions(out)
    for rec in manifest.values():
        stages = rec["stage_metrics"]
        assert stages, "per-stage metrics missing from lineage record"
        names = " ".join(s["stage"] for s in stages)
        assert "ReadParquet" in names
        assert all(s["wall_s"] >= 0 for s in stages)
        # the partition's extraction output rows appear in some stage
        assert any(s["rows_out"] for s in stages)


def test_cli_run_flagship(ray_session, tmp_path, capsys):
    from docling_eval_ray.__main__ import main

    out = str(tmp_path / "job_out")
    rc = main(["run-flagship", "--sf-dir", SF_DIR, "--output", out,
               "--partitions", "2"])
    assert rc in (0, None)
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(report["ran"]) == [0, 1]
    assert report["rows"] == 500
    assert report["rows_per_sec"] > 0
    assert report["stage_latency"], "job report missing per-stage latency"


def test_stats_parser_does_not_steal_dataset_throughput():
    """Regression: a trailing all-to-all operator with NO throughput
    line of its own must not report the dataset-level 'Ray Data
    throughput' as its stage throughput."""
    from docling_eval_ray.state.metrics import parse_dataset_stats

    text = """Operator 1 ReadParquet: 1 tasks executed, 8 blocks produced in 0.28s
* Output num rows per block: 62 min, 63 max, 62 mean, 500 total
* Operator throughput:
\t* Ray Data throughput: 1799.42 rows/s

Operator 2 Aggregate: executed in 2.51s

\tSuboperator 0 AggregateMap: 1 tasks executed, 8 blocks produced
\t* Output num rows per block: 10 min, 12 max, 11 mean, 90 total

Dataset throughput:
\t* Ray Data throughput: 506.36 rows/s
"""
    rows = parse_dataset_stats(text)
    assert rows[1]["stage"] == "Aggregate"
    assert rows[1]["rows_per_s"] is None  # NOT 506.36
    assert rows[1]["rows_out"] == 90


def test_lineage_numeric_doc_id_range(ray_session, tmp_path):
    """Regression: doc_id ranges compare in the column's native type —
    a stringified compare records min(2, 10) as 10."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from docling_eval_ray.state.lineage import MANIFEST, run_partitioned

    def make_ds(pid):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array([10, 2, 100], pa.int64()),
             "v": pa.array([1, 2, 3], pa.int64())}
        ))

    run_partitioned([0], make_ds, str(tmp_path), stage="t")
    rec = json.loads((tmp_path / MANIFEST).read_text().splitlines()[0])
    assert rec["doc_id_min"] == 2 and rec["doc_id_max"] == 100


def test_read_checkpointed_empty_raises_clearly(tmp_path):
    import pytest

    from docling_eval_ray.state.lineage import read_checkpointed

    with pytest.raises(FileNotFoundError, match="no committed partitions"):
        read_checkpointed(str(tmp_path))
