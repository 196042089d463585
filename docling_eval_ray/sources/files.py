"""File-based sources and sinks (reference §2.1 S3/S5-S8 analogues).

* ``read_document_files`` — local-folder binary source
  (file_dataset_builder.py:76-161): ``read_binary_files`` with paths,
  extension filter + deterministic path sort, mimetype guess, sha256
  doc hash.
* ``prediction_file_source`` — doc_id → prediction payload lookup
  (file_provider.py:152-267): the doc_id→path map is broadcast, payloads
  are read inside ``map_batches`` (no shuffle).
* ``dataset_exists`` — ≥1-row existence probe (utils/utils.py:462-481)
  without reading the dataset.
* ``write_dataset_info`` — schema + row-count manifest JSON next to the
  output (utils/utils.py:55-95).
"""

from __future__ import annotations

import hashlib
import json
import mimetypes
from pathlib import Path

import pyarrow as pa

# Module-scope, not lazy: PredictionFileLookup.__call__ runs on workers;
# runtime relative imports there die off-repo. Both leaf modules.
from ..datamodel.schema import SPAN_STRUCT
from ..functions.doctags import parse_prediction_payload


def read_document_files(root: str, *, extensions: tuple[str, ...] = (),
                        begin_index: int = 0, end_index: int = -1):
    """Folder of document files → Dataset(doc_id, path, mime_type,
    doc_hash, n_bytes, original). Deterministic order by sorted path;
    begin/end slicing mirrors the reference's index-range sharding (O2).
    """
    import ray.data as rd

    paths = sorted(
        str(p)
        for p in Path(root).rglob("*")
        if p.is_file()
        and (not extensions or p.suffix.lstrip(".").lower() in extensions)
    )
    if end_index >= 0:
        paths = paths[begin_index:end_index]
    elif begin_index:
        paths = paths[begin_index:]
    if not paths:
        # typed empty dataset: from_items([]) is schema-less and crashes
        # downstream schema consumers (the documented empty-Dataset trap)
        return rd.from_arrow(pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "mime_type": pa.array([], pa.string()),
                "doc_hash": pa.array([], pa.string()),
                "n_bytes": pa.array([], pa.int64()),
                "original": pa.array([], pa.binary()),
            }
        ))

    # doc_id = path relative to the root, extension stripped: a bare
    # stem collides for same-named files in different subdirectories
    # (rglob is recursive) and would silently conflate two documents in
    # every doc_id-keyed join downstream. Same-dir same-stem collisions
    # (report.pdf + report.md) keep the suffix to stay distinct.
    root_resolved = Path(root).resolve()

    def _doc_id(p: str, keep_suffix: bool) -> str:
        rel = Path(p).resolve().relative_to(root_resolved)
        rel = rel if keep_suffix else rel.with_suffix("")
        return "/".join(rel.parts)

    bare = [_doc_id(p, False) for p in paths]
    dup = {d for d in bare if bare.count(d) > 1} if (
        len(set(bare)) != len(bare)
    ) else set()
    # keyed by basename: read_binary_files may normalize the path form,
    # but the filename survives any normalization; basenames are unique
    # here iff the doc_ids are (both derive from the relative path)
    id_map = {
        Path(p).name + "\x00" + str(Path(p).resolve().parent): (
            _doc_id(p, True) if b in dup else b
        )
        for p, b in zip(paths, bare)
    }

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        out_paths = t["path"].to_pylist()
        data = t["bytes"].to_pylist()

        def did(p: str) -> str:
            key = Path(p).name + "\x00" + str(Path(p).resolve().parent)
            got = id_map.get(key)
            return got if got is not None else Path(p).stem

        return pa.table(
            {
                "doc_id": pa.array(
                    [did(p) for p in out_paths], pa.string()
                ),
                "path": pa.array(out_paths, pa.string()),
                "mime_type": pa.array(
                    [mimetypes.guess_type(p)[0] or "application/octet-stream"
                     for p in out_paths],
                    pa.string(),
                ),
                "doc_hash": pa.array(
                    [hashlib.sha256(b).hexdigest() for b in data], pa.string()
                ),
                "n_bytes": pa.array([len(b) for b in data], pa.int64()),
                "original": pa.array(data, pa.binary()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


class PredictionFileLookup:
    """Broadcast doc_id→path probe + payload read per batch (J2).
    With ``parse=True`` the negotiated payload is parsed into the
    canonical span sequence (doctags for ``.dt``, markdown otherwise —
    M18/M19, reference base_evaluator.py:42-62 + file_provider
    format dispatch)."""

    def __init__(self, mapping_ref, parse: bool = False):
        import ray

        self._map = (
            ray.get(mapping_ref)
            if isinstance(mapping_ref, ray.ObjectRef)
            else mapping_ref
        )
        self._parse = parse

    def __call__(self, t: pa.Table) -> pa.Table:
        preds, found, fmts, spans = [], [], [], []
        for did in t["doc_id"].to_pylist():
            p = self._map.get(did)
            if p is None:
                preds.append("")
                found.append(False)
                fmts.append("")
                spans.append([])
                continue
            payload = Path(p).read_text()
            suffix = Path(p).suffix
            preds.append(payload)
            found.append(True)
            fmts.append(suffix)
            if self._parse:
                parsed = parse_prediction_payload(payload, suffix, did)
                spans.append(
                    [{k: s[k] for k in
                      ("kind", "text", "media_ref", "offset")}
                     for s in parsed]
                )
            else:
                spans.append([])
        out = (
            t.append_column("prediction", pa.array(preds, pa.string()))
            .append_column("prediction_found", pa.array(found, pa.bool_()))
            .append_column("prediction_format", pa.array(fmts, pa.string()))
        )
        if self._parse:
            out = out.append_column(
                "pred_spans", pa.array(spans, pa.list_(SPAN_STRUCT))
            )
        return out


def prediction_file_source(ds, pred_dir: str,
                           suffixes: tuple[str, ...] = (".dt", ".md", ".txt",
                                                        ".json"),
                           *, parse: bool = False):
    """Enrich a documents Dataset with per-doc prediction files keyed by
    doc_id (format negotiation in priority order, M19 — doctags ``.dt``
    outranks markdown by default, mirroring the reference's
    DoclingDocument > JSON > doctags ordering for the formats this
    engine parses)."""
    import ray

    from ..stages.util import stage

    mapping: dict[str, str] = {}
    for suffix in reversed(suffixes):  # earlier suffixes win
        for p in Path(pred_dir).glob(f"*{suffix}"):
            mapping[p.stem] = str(p)
    ref = ray.put(mapping)
    return stage(ds, PredictionFileLookup, args=(ref, parse))


def dataset_exists(path: str) -> bool:
    """True iff the parquet dataset at ``path`` has ≥1 row — a streaming
    probe (limit(1)), not a full read."""
    import ray.data as rd

    try:
        return len(rd.read_parquet(path).limit(1).take(1)) > 0
    except Exception:
        return False


def write_dataset_info(out_dir: str, name: str, ds) -> dict:
    """Write the schema + row-count manifest next to the data."""
    schema = ds.schema()
    info = {
        "dataset_name": name,
        "num_rows": ds.count(),
        "columns": [
            {"name": n, "type": str(t)}
            for n, t in zip(schema.names, schema.types)
        ],
    }
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    (Path(out_dir) / "dataset_infos.json").write_text(json.dumps(info, indent=2))
    return info
