"""Offline HF-hub snapshot source (S1).

The reference retrieves datasets with ``huggingface_hub.snapshot_download``
and reads the materialized snapshot directory (dataset_builder.py:153-195).
There is no network in this container, so the retrieval half stays out of
scope — but the on-disk layout it produces is a public convention this
module reads natively:

* parquet shards ``data/<split>-NNNNN-of-MMMMM.parquet`` (the hub's
  parquet export naming), or a bare ``<split>/*.parquet`` directory;
* ``dataset_infos.json`` metadata (num_examples per split, features).

The reader enforces the shard-count contract the filenames encode —
every ``of-MMMMM`` suffix must agree and all ``MMMMM`` shards must be
present (a partial snapshot download is detected HERE, not as a silent
row undercount three stages later) — then hands the deterministic,
sorted file list to ``ray.data.read_parquet`` with column pruning, so
the scan itself is the standard streaming source (O1 path ordering).

``write_hf_snapshot`` is the fixture-shaped inverse (driver-sized
tables → hub-layout shards + dataset_infos.json) used by tests and the
round-trip query; a production exporter would be ``write_parquet`` with
a filename provider plus this module's manifest conventions.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def _split_shards(root: Path, split: str) -> list[Path]:
    """Locate and integrity-check the split's shard files."""
    pat = re.compile(rf"^{re.escape(split)}-(\d{{5}})-of-(\d{{5}})\.parquet$")
    data_dir = root / "data"
    found: dict[int, Path] = {}
    totals: set[int] = set()
    if data_dir.is_dir():
        for f in sorted(data_dir.iterdir()):
            m = pat.match(f.name)
            if m:
                found[int(m.group(1))] = f
                totals.add(int(m.group(2)))
    if not found:
        # bare <split>/ directory fallback (older layouts)
        alt = root / split
        if alt.is_dir():
            files = sorted(alt.glob("*.parquet"))
            if files:
                return files
        raise FileNotFoundError(
            f"no parquet shards for split {split!r} under {root}"
        )
    if len(totals) != 1:
        raise ValueError(
            f"inconsistent shard-count suffixes for split {split!r}: "
            f"{sorted(totals)}"
        )
    total = totals.pop()
    missing = sorted(set(range(total)) - set(found))
    if missing:
        raise ValueError(
            f"split {split!r} is missing shards {missing} of {total} — "
            "partial snapshot (re-download or re-export)"
        )
    return [found[i] for i in range(total)]


def snapshot_info(root: str) -> dict:
    """Parsed ``dataset_infos.json`` (empty dict if absent)."""
    p = Path(root) / "dataset_infos.json"
    if not p.exists():
        return {}
    raw = json.loads(p.read_text())
    # hub layout nests under the config name; single-config snapshots
    # collapse to the one value
    if raw and all(isinstance(v, dict) for v in raw.values()):
        if len(raw) == 1:
            return next(iter(raw.values()))
    return raw


def read_hf_snapshot(root: str, *, split: str = "train",
                     columns: list[str] | None = None,
                     verify_num_examples: bool = False):
    """Streaming Dataset over one split of a local HF snapshot.

    ``verify_num_examples`` cross-checks the metadata row count against
    the parquet footers (metadata-only — no data pass) and raises on
    mismatch, the S2-style resume/integrity counter."""
    import ray.data as rd

    shards = _split_shards(Path(root), split)
    if verify_num_examples:
        info = snapshot_info(root)
        want = (
            info.get("splits", {}).get(split, {}).get("num_examples")
            if isinstance(info.get("splits"), dict) else None
        )
        if want is not None:
            have = sum(pq.read_metadata(f).num_rows for f in shards)
            if have != int(want):
                raise ValueError(
                    f"split {split!r} has {have} rows in parquet but "
                    f"dataset_infos.json promises {want}"
                )
    return rd.read_parquet([str(f) for f in shards], columns=columns)


def write_hf_snapshot(table: pa.Table, root: str, *, split: str = "train",
                      shards: int = 2, name: str = "snapshot") -> dict:
    """Write a driver-sized table as a hub-layout snapshot (fixture /
    round-trip writer): ``data/<split>-NNNNN-of-MMMMM.parquet`` with
    rows round-robined deterministically by position, plus
    ``dataset_infos.json``."""
    out = Path(root)
    (out / "data").mkdir(parents=True, exist_ok=True)
    n = table.num_rows
    for i in range(shards):
        idx = list(range(i, n, shards))
        pq.write_table(
            table.take(idx),
            out / "data" / f"{split}-{i:05d}-of-{shards:05d}.parquet",
        )
    info = {
        name: {
            "splits": {split: {"num_examples": n}},
            "features": {f.name: str(f.type) for f in table.schema},
        }
    }
    (out / "dataset_infos.json").write_text(json.dumps(info, indent=2))
    return info[name]


def hf_snapshot_roundtrip(sf_dir: str):
    """Oracled round-trip query: export the documents table as a
    hub-layout snapshot (2 shards + dataset_infos.json under /tmp),
    read it back through ``read_hf_snapshot`` with column pruning and
    the metadata integrity check, and return the per-language census —
    which hash-matches the census DuckDB computes on the ORIGINAL
    table iff the export/read cycle lost nothing."""
    import hashlib

    from ..functions.groups import count_partial, final_groupby_sum

    src = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "lang"])
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = f"/tmp/hf_snapshot_{tag}"
    write_hf_snapshot(src, root, split="train", shards=2,
                      name="documents")
    ds = read_hf_snapshot(root, split="train", columns=["lang"],
                          verify_num_examples=True)
    out = final_groupby_sum(
        ds.map_batches(count_partial("lang", "n_docs"),
                       batch_format="pyarrow"),
        ["lang"], ["n_docs"],
    )
    import pyarrow.compute as pc

    return out.map_batches(
        lambda t: pa.table({"lang": t["lang"],
                            "n_docs": pc.cast(t["n_docs"], pa.int64())}),
        batch_format="pyarrow",
    )
