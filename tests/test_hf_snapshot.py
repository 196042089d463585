"""Offline HF-snapshot source (S1): hub parquet-shard layout, shard
integrity contract, metadata verification, round-trip census."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docling_eval_ray.sources.hf_snapshot import (
    hf_snapshot_roundtrip,
    read_hf_snapshot,
    snapshot_info,
    write_hf_snapshot,
)


def _table(n=20):
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "lang": pa.array(["en", "de"] * (n // 2))})


def test_snapshot_roundtrip_preserves_rows(ray_session, tmp_path):
    t = _table()
    info = write_hf_snapshot(t, str(tmp_path), shards=3, name="docs")
    assert info["splits"]["train"]["num_examples"] == 20
    files = sorted((tmp_path / "data").iterdir())
    assert [f.name for f in files] == [
        f"train-{i:05d}-of-00003.parquet" for i in range(3)
    ]
    ds = read_hf_snapshot(str(tmp_path), verify_num_examples=True)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(20))
    # column pruning honored
    assert read_hf_snapshot(str(tmp_path),
                            columns=["lang"]).schema().names == ["lang"]


def test_snapshot_missing_shard_detected(tmp_path):
    write_hf_snapshot(_table(), str(tmp_path), shards=3)
    (tmp_path / "data" / "train-00001-of-00003.parquet").unlink()
    with pytest.raises(ValueError, match=r"missing shards \[1\]"):
        read_hf_snapshot(str(tmp_path))


def test_snapshot_inconsistent_totals_detected(tmp_path):
    write_hf_snapshot(_table(), str(tmp_path), shards=2)
    pq.write_table(_table(4),
                   tmp_path / "data" / "train-00002-of-00004.parquet")
    with pytest.raises(ValueError, match="inconsistent shard-count"):
        read_hf_snapshot(str(tmp_path))


def test_snapshot_num_examples_mismatch_detected(tmp_path):
    write_hf_snapshot(_table(), str(tmp_path), shards=2)
    infos = json.loads((tmp_path / "dataset_infos.json").read_text())
    infos["snapshot"]["splits"]["train"]["num_examples"] = 99
    (tmp_path / "dataset_infos.json").write_text(json.dumps(infos))
    with pytest.raises(ValueError, match="promises 99"):
        read_hf_snapshot(str(tmp_path), verify_num_examples=True)


def test_snapshot_bare_split_dir_fallback(ray_session, tmp_path):
    (tmp_path / "train").mkdir()
    pq.write_table(_table(6), tmp_path / "train" / "part0.parquet")
    ds = read_hf_snapshot(str(tmp_path))
    assert ds.count() == 6
    with pytest.raises(FileNotFoundError, match="no parquet shards"):
        read_hf_snapshot(str(tmp_path), split="validation")


def test_snapshot_info_single_config_collapse(tmp_path):
    write_hf_snapshot(_table(), str(tmp_path), name="only")
    info = snapshot_info(str(tmp_path))
    assert info["splits"]["train"]["num_examples"] == 20
    assert snapshot_info(str(tmp_path / "nowhere")) == {}


def test_hf_snapshot_roundtrip_census(ray_session):
    got = hf_snapshot_roundtrip("/root/testdata/sf0.001").to_pandas()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["lang"])
    import collections
    want = collections.Counter(t["lang"].to_pylist())
    assert dict(zip(got["lang"], got["n_docs"])) == dict(want)


def test_write_hf_snapshot_clears_stale_shards(ray_session, tmp_path):
    """A leftover shard with a different of-MMMMM total must not poison
    later reads: both writers clear the split's old shards first."""
    write_hf_snapshot(_table(), str(tmp_path), shards=4)
    write_hf_snapshot(_table(), str(tmp_path), shards=2)  # re-export
    assert sorted(f.name for f in (tmp_path / "data").iterdir()) == [
        "train-00000-of-00002.parquet", "train-00001-of-00002.parquet"
    ]
    assert read_hf_snapshot(str(tmp_path)).count() == 20


def test_write_hf_snapshot_dataset_distributed(ray_session, tmp_path):
    """The streaming exporter: repartition + write_parquet + rename —
    correct hub names, correct num_examples, readable back."""
    import ray.data as rd

    from docling_eval_ray.sources.hf_snapshot import write_hf_snapshot_dataset

    ds = rd.from_arrow(_table(30))
    info = write_hf_snapshot_dataset(ds, str(tmp_path), shards=3,
                                     name="docs")
    assert info["splits"]["train"]["num_examples"] == 30
    names = sorted(f.name for f in (tmp_path / "data").iterdir())
    assert names == [f"train-{i:05d}-of-00003.parquet" for i in range(3)]
    back = read_hf_snapshot(str(tmp_path), verify_num_examples=True)
    assert sorted(back.to_pandas()["doc_id"]) == list(range(30))


def test_read_hf_snapshot_file_uri_root(tmp_path, ray_session):
    """file:// URI root goes through FileSystem.from_uri — the same
    native route an s3:// root takes on a real cluster — and must
    return the identical dataset as the plain-path read."""
    import pyarrow as pa

    from docling_eval_ray.sources.hf_snapshot import (
        read_hf_snapshot,
        write_hf_snapshot,
    )

    t = pa.table({"doc_id": list(range(10)),
                  "lang": ["en", "fr"] * 5})
    write_hf_snapshot(t, str(tmp_path), split="train", shards=3)
    plain = read_hf_snapshot(str(tmp_path), verify_num_examples=True)
    uri = read_hf_snapshot(f"file://{tmp_path}", verify_num_examples=True)
    assert plain.count() == uri.count() == 10
    assert sorted(r["doc_id"] for r in uri.take_all()) == list(range(10))


def test_split_shards_fs_partial_snapshot_uri(tmp_path):
    import pytest

    from docling_eval_ray.sources.hf_snapshot import (
        _resolve_root,
        _split_shards_fs,
    )

    data = tmp_path / "data"
    data.mkdir()
    (data / "train-00000-of-00002.parquet").write_bytes(b"x")
    fs, base = _resolve_root(f"file://{tmp_path}")
    with pytest.raises(ValueError, match="missing shards"):
        _split_shards_fs(fs, base, "train")
