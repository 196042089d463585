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
