"""S3-shaped source: pagination, empty-object skip, skip-existing
resume, snapshot-then-read flow (reference dataset_builder.py:35-109)."""

from docling_eval_ray.sources.s3 import (
    LocalFakeStore,
    ObjectStoreSource,
    read_store_documents,
)


def _make_store(tmp_path, n=25):
    root = tmp_path / "bucket"
    (root / "sub").mkdir(parents=True)
    for i in range(n):
        d = root / "sub" if i % 3 == 0 else root
        (d / f"obj_{i:03d}.txt").write_text(f"payload {i}")
    (root / "empty.bin").write_bytes(b"")  # zero-size: skipped
    return LocalFakeStore(str(root))


def test_paginated_download_and_resume(tmp_path):
    store = _make_store(tmp_path)
    src = ObjectStoreSource(store, store.prefix, page_size=10)
    dest = tmp_path / "snapshot"

    stats = src.download_objects(str(dest))
    assert stats["n_pages"] == 3          # 26 objects at MaxKeys=10
    assert stats["n_downloaded"] == 25
    assert stats["n_skipped_empty"] == 1  # zero-size object
    assert (dest / "sub" / "obj_000.txt").read_text() == "payload 0"

    # resume: everything already on disk is skipped, nothing re-downloaded
    stats2 = src.download_objects(str(dest))
    assert stats2["n_downloaded"] == 0
    assert stats2["n_skipped_existing"] == 25

    # partial resume: delete two files, only those come back
    (dest / "obj_001.txt").unlink()
    (dest / "sub" / "obj_003.txt").unlink()
    stats3 = src.download_objects(str(dest))
    assert stats3["n_downloaded"] == 2
    assert stats3["n_skipped_existing"] == 23


def test_snapshot_then_read(ray_session, tmp_path):
    store = _make_store(tmp_path, n=6)
    ds = read_store_documents(
        store, store.prefix, str(tmp_path / "snap"), extensions=("txt",)
    )
    df = ds.to_pandas()
    assert len(df) == 6
    assert set(df.columns) >= {"doc_id", "doc_hash", "n_bytes", "original"}
    assert (df["n_bytes"] > 0).all()


def test_download_rejects_foreign_and_traversal_keys(tmp_path):
    """S3 Prefix matching is not '/'-delimited and buckets are
    untrusted: sibling-prefix keys are skipped, '..' keys never write
    outside the snapshot dir."""
    from docling_eval_ray.sources.s3 import ObjectStoreSource

    class EvilStore:
        def list_page(self, prefix, token, page_size):
            return ([
                {"Key": f"{prefix}/good.txt", "Size": 4},
                {"Key": f"{prefix}-extra/smuggled.txt", "Size": 4},
                {"Key": f"{prefix}/../../escape.txt", "Size": 4},
            ], None)

        def get(self, key):
            return b"DATA"

    dest = tmp_path / "snap"
    out = ObjectStoreSource(EvilStore(), "datasets/sample").download_objects(
        str(dest)
    )
    assert out["n_downloaded"] == 1
    assert out["n_skipped_foreign"] == 2
    assert (dest / "good.txt").read_bytes() == b"DATA"
    assert not (tmp_path / "escape.txt").exists()


def test_partial_download_is_refetched(tmp_path):
    """Resume must not trust a truncated file: size mismatch against
    the listing re-downloads (writes are atomic via temp + replace)."""
    from docling_eval_ray.sources.s3 import LocalFakeStore, ObjectStoreSource

    src = tmp_path / "bucket"
    src.mkdir()
    (src / "doc.txt").write_bytes(b"full content")
    store = LocalFakeStore(str(src))
    dest = tmp_path / "snap"
    dest.mkdir()
    (dest / "doc.txt").write_bytes(b"torn")  # crashed mid-write
    out = ObjectStoreSource(store, store.prefix).download_objects(str(dest))
    assert out["n_redownloaded_partial"] == 1
    assert (dest / "doc.txt").read_bytes() == b"full content"
    # second run: intact file skips
    out2 = ObjectStoreSource(store, store.prefix).download_objects(str(dest))
    assert out2["n_skipped_existing"] == 1 and out2["n_downloaded"] == 0


def test_read_uri_objects_file_scheme_matches_snapshot(tmp_path,
                                                       ray_session):
    """The native URI read (file:// here, s3:// on a cluster) must see
    exactly the bytes the snapshot-download path mirrors."""
    from docling_eval_ray.sources.s3 import (
        LocalFakeStore,
        ObjectStoreSource,
        read_uri_objects,
    )

    src = tmp_path / "bucket"
    for rel, body in [("a/x.txt", b"alpha"), ("a/y.bin", b"\x00beta"),
                      ("z.md", b"# gamma")]:
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(body)

    # snapshot path (reference-parity download flow)
    snap = tmp_path / "snapshot"
    store = LocalFakeStore(str(src), prefix="datasets/sample")
    ObjectStoreSource(store, "datasets/sample").download_objects(str(snap))

    # native URI path over the same objects
    ds = read_uri_objects(f"file://{src}")
    rows = ds.take_all()
    by_name = {r["path"].split("/")[-1]: r["bytes"] for r in rows}
    assert len(rows) == 3
    for rel, body in [("x.txt", b"alpha"), ("y.bin", b"\x00beta"),
                      ("z.md", b"# gamma")]:
        assert by_name[rel] == body
        snap_match = [p for p in snap.rglob("*") if p.name == rel]
        assert len(snap_match) == 1 and snap_match[0].read_bytes() == body


def test_read_uri_objects_plain_path(tmp_path, ray_session):
    from docling_eval_ray.sources.s3 import read_uri_objects

    (tmp_path / "only.bin").write_bytes(b"payload")
    ds = read_uri_objects(str(tmp_path))
    assert ds.count() == 1
