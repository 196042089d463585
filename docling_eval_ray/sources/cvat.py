"""CVAT annotation round-trip (reference
dataset_builders/cvat_dataset_builder.py:864-1449): CVAT XML → reading-
ordered canonical span sequence.

Semantics reimplemented from the reference:

* per-image ``<box label= xtl= ytl= xbr= ybr=>`` elements are the layout
  items; ``<polyline label= points="x,y;x,y;…">`` elements encode the
  relations (cvat_dataset_builder.py:238-383);
* each polyline point resolves to the SMALLEST-area valid box containing
  it (``find_box``, cvat_dataset_builder.py:203-237; −1 when none);
* the ``reading_order`` polyline drives document order; an image
  without one is skipped and counted (cvat_dataset_builder.py:975-980
  ``keep=False``);
* ``merge``/``next_text`` polylines merge later boxes into the first
  (text joined with a space, merged boxes never re-emitted);
* ``to_caption`` / ``to_footnote`` polylines attach caption/footnote
  boxes directly after their parent item
  (cvat_dataset_builder.py:664-783); a caption/footnote box that IS a
  target of such a line is never emitted standalone when the reading
  order reaches it directly (``is_linked`` skip,
  cvat_dataset_builder.py:1070-1095);
* ``group``/``next_figure`` polylines group pictures: the head picture
  absorbs every member (one picture item spanning the group, members
  consumed — get_grouped_images, cvat_dataset_builder.py:585-663) —
  and group a head LIST_ITEM with its members as consecutive list-item
  spans (add_listitems_to_group via first_in_group,
  cvat_dataset_builder.py:1106-1130);
* boxes already emitted are skipped when reading order revisits them
  (cvat_dataset_builder.py:985-990).

Divergences (documented): section-header ``level`` attributes have no
slot in the span struct (kind carries the label only), and
``to_value`` lines are parsed-and-ignored exactly like the reference's
emission loop (it builds empty GraphData for form/KV regions).

Divergence (container constraint, same class as the M6/M8 media stubs):
the reference reads each box's text from the parsed PDF's cells
(get_label_prov_and_text, cvat_dataset_builder.py:452-500); no PDF
backend exists here, so text rides in a CVAT ``<attribute
name="text">`` child — the relation/order semantics above are the real,
tested surface.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile
from pathlib import Path

import pyarrow as pa

from ..datamodel.schema import MEDIA_KINDS, SPAN_STRUCT

CVAT_GT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        pa.field("status", pa.string()),
        pa.field("n_boxes", pa.int32()),
        # find_table_data donations, keyed by the receiving table
        # span's offset (empty when no table_source was supplied —
        # table spans are MEDIA_KINDS, their text/media_ref stay
        # untouched by design, so donated structure rides beside the
        # span sequence instead of inside it)
        pa.field(
            "table_data",
            pa.list_(
                pa.struct(
                    [
                        pa.field("offset", pa.int32()),
                        pa.field("otsl", pa.string()),
                    ]
                )
            ),
        ),
    ]
)

SAMPLE_XML = str(
    Path(__file__).resolve().parents[2]
    / "tests/data/cvat_sample/annotations.xml"
)


def parse_cvat_xml(xml_str: str) -> list[dict]:
    """CVAT ``<annotations><image>…`` XML → per-image dicts of boxes
    (label, ltrb, text) and polylines (label, points)."""
    root = ET.fromstring(xml_str)
    images = []
    for img in root.iter("image"):
        boxes = []
        malformed = False
        for b in img.findall("box"):
            text = ""
            for attr in b.findall("attribute"):
                if attr.get("name") == "text":
                    text = attr.text or ""
            try:
                coords = {
                    "l": float(b.get("xtl")),
                    "t": float(b.get("ytl")),
                    "r": float(b.get("xbr")),
                    "b": float(b.get("ybr")),
                }
            except (TypeError, ValueError):
                # a box missing a coordinate poisons THIS IMAGE only
                # (skip-and-count, the builder contract) — never the
                # whole batch task
                malformed = True
                continue
            boxes.append(
                {"label": b.get("label", "text"), **coords, "text": text}
            )
        polylines = []
        for p in img.findall("polyline"):
            points = []
            for pt in (p.get("points") or "").split(";"):
                xy = pt.split(",")
                if len(xy) == 2:
                    points.append((float(xy[0]), float(xy[1])))
            polylines.append({"label": p.get("label", ""), "points": points})
        images.append(
            {"name": img.get("name", ""), "boxes": boxes,
             "polylines": polylines, "malformed": malformed}
        )
    return images


def find_box(boxes: list[dict], point: tuple[float, float]) -> int:
    """Smallest-area valid box containing the point, −1 if none
    (cvat_dataset_builder.py:203-237)."""
    index, area = -1, float("inf")
    x, y = point
    for i, b in enumerate(boxes):
        if not (b["l"] < b["r"] and b["t"] < b["b"]):
            continue
        if b["l"] <= x <= b["r"] and b["t"] <= y <= b["b"]:
            a = (b["r"] - b["l"]) * (b["b"] - b["t"])
            if a < area:
                index, area = i, a
    return index


def find_table_data(box: dict, candidates: list[dict],
                    *, iou_cutoff: float = 0.90) -> str:
    """Reference ``find_table_data`` (cvat_dataset_builder.py:1451-1485):
    scan the pre-converted document's tables in document order; the
    FIRST whose bbox IoU with the GT table box exceeds the cutoff
    (strict ``>``) donates its structure, no match → the empty marker
    (the reference returns ``TableData(num_rows=-1, num_cols=-1, [])``).
    Candidates carry l/t/r/b plus ``otsl`` — the house table-structure
    string (``functions/tables.py``)."""
    gl, gt_, gr, gb = box["l"], box["t"], box["r"], box["b"]
    for cand in candidates:
        il = max(gl, cand["l"])
        it = max(gt_, cand["t"])
        ir = min(gr, cand["r"])
        ib = min(gb, cand["b"])
        inter = max(ir - il, 0.0) * max(ib - it, 0.0)
        union = (
            (gr - gl) * (gb - gt_)
            + (cand["r"] - cand["l"]) * (cand["b"] - cand["t"])
            - inter
        )
        if union > 0 and inter / union > iou_cutoff:
            return cand.get("otsl", "")
    return ""


def cvat_to_spans(
    image: dict, *, table_source: list[dict] | None = None
) -> tuple[list[dict], str, list[dict]]:
    """One CVAT image annotation → (spans, status, table_data).
    ``table_source`` (optional) is the pre-converted document's table
    list for THIS image: when given, every GT ``table`` span receives
    an IoU-matched donated structure (empty string when unmatched), the
    reference's find_table_data injection — recorded in ``table_data``
    as (offset, otsl) beside the span sequence, because table spans are
    MEDIA_KINDS whose text/media_ref the span invariant owns."""
    if image.get("malformed"):
        return [], "malformed_box", []
    boxes = image["boxes"]
    reading_orders: list[dict] = []
    to_captions, to_footnotes, merges, groups = [], [], [], []
    for line in image["polylines"]:
        boxids = [find_box(boxes, p) for p in line["points"]]
        entry = {**line, "boxids": boxids}
        label = line["label"]
        if label == "reading_order":
            reading_orders.append(entry)
        elif label == "to_caption":
            to_captions.append(entry)
        elif label == "to_footnote":
            to_footnotes.append(entry)
        elif label in ("next_text", "merge"):
            merges.append(entry)
        elif label in ("next_figure", "group"):
            groups.append(entry)
        # to_value: parsed then ignored, like the reference's emission
        # loop (form/KV regions get empty graphs)

    # the reference's contains_reading_order gate demands EXACTLY ONE
    # reading_order polyline (cvat_dataset_builder.py:1299-1302, gated
    # at :1331) — zero or several both skip the image entirely
    if not reading_orders:
        return [], "no_reading_order", []
    if len(reading_orders) > 1:
        return [], "multiple_reading_order", []
    reading_order = reading_orders[0]

    # caption/footnote boxes that are TARGETS of an attach line are only
    # ever emitted through their parent (reference is_linked skip)
    linked: set[int] = set()
    for lines in (to_captions, to_footnotes):
        for cline in lines:
            ids = [i for i in cline["boxids"] if i >= 0]
            linked.update(ids[1:])

    spans: list[dict] = []
    already: set[int] = set()

    def group_members(boxid: int) -> list[int]:
        """Members a group-head box absorbs (first_in_group semantics:
        group lines whose FIRST id is this box)."""
        out: list[int] = []
        for gline in groups:
            ids = [i for i in gline["boxids"] if i >= 0]
            if len(ids) > 1 and ids[0] == boxid:
                out.extend(ids[1:])
        return out

    table_data: list[dict] = []

    def emit(boxid: int, kind: str | None = None) -> None:
        b = boxes[boxid]
        k = kind or b["label"]
        text = b["text"]
        if k == "table" and table_source is not None:
            table_data.append(
                {
                    "offset": len(spans),
                    "otsl": find_table_data(b, table_source),
                }
            )
        # merge chains: first box absorbs the rest
        for mline in merges:
            ids = [i for i in mline["boxids"] if i >= 0]
            if ids and ids[0] == boxid:
                for extra in ids[1:]:
                    if extra not in already:
                        text = (text + " " + boxes[extra]["text"]).strip()
                        already.add(extra)
        media = (
            f"cvat/{image['name']}/{boxid}" if k in MEDIA_KINDS else ""
        )
        spans.append(
            {"kind": k, "text": "" if media else text,
             "media_ref": media, "offset": len(spans)}
        )
        already.add(boxid)
        if k in MEDIA_KINDS:
            # grouped pictures: ONE picture item represents the whole
            # group; members are consumed, never re-emitted
            for member in group_members(boxid):
                already.add(member)
        elif k == "list_item":
            # list group: the head's members follow as consecutive
            # list-item spans regardless of reading-order position
            for member in group_members(boxid):
                if member not in already:
                    spans.append(
                        {"kind": "list_item",
                         "text": boxes[member]["text"],
                         "media_ref": "", "offset": len(spans)}
                    )
                    already.add(member)
        # captions / footnotes attach right after their parent
        for lines, attach_kind in ((to_captions, "caption"),
                                   (to_footnotes, "footnote")):
            for cline in lines:
                ids = [i for i in cline["boxids"] if i >= 0]
                if ids and ids[0] == boxid:
                    for cid in ids[1:]:
                        if cid not in already:
                            spans.append(
                                {"kind": attach_kind,
                                 "text": boxes[cid]["text"],
                                 "media_ref": "", "offset": len(spans)}
                            )
                            already.add(cid)

    for boxid in reading_order["boxids"]:
        if boxid < 0 or boxid in already:
            continue
        if boxid in linked and boxes[boxid]["label"] in (
            "caption", "footnote"
        ):
            continue  # emitted via its parent (is_linked skip)
        emit(boxid)
    return spans, "success", table_data


def build_cvat_gt(
    xml_path: str | list[str],
    *,
    table_source: dict[str, list[dict]] | None = None,
):
    """CVAT annotations file(s) → Dataset(CVAT_GT_SCHEMA); images
    without a reading order become status rows (skip-and-count), not
    exceptions. ``table_source`` (optional, image name → pre-converted
    table candidates) enables the reference's find_table_data structure
    injection; it is per-image-sized broadcast state, captured by value
    into the worker closure."""
    import ray.data as rd

    paths = [xml_path] if isinstance(xml_path, str) else list(xml_path)
    ds = rd.read_binary_files(paths)

    def build(t: pa.Table) -> pa.Table:
        rows = []
        for raw in t["bytes"].to_pylist():
            # CVAT exports arrive as task zips or bare XML; the
            # reference unzips to disk first (get_annotation_files /
            # unzip_annotation_files, cvat_dataset_builder.py:116-186)
            # — here zip members stream in-memory, namelist order
            if raw[:4] == b"PK\x03\x04":
                with zipfile.ZipFile(io.BytesIO(raw)) as zf:
                    xmls = [
                        zf.read(n).decode()
                        for n in zf.namelist()
                        if n.lower().endswith(".xml")
                    ]
            else:
                xmls = [raw.decode()]
            for xml_str in xmls:
                for image in parse_cvat_xml(xml_str):
                    spans, status, table_data = cvat_to_spans(
                        image,
                        table_source=None
                        if table_source is None
                        else table_source.get(image["name"], []),
                    )
                    rows.append(
                        {
                            "doc_id": image["name"],
                            "spans": spans,
                            "status": status,
                            "n_boxes": len(image["boxes"]),
                            "table_data": table_data,
                        }
                    )
        return pa.Table.from_pylist(rows, schema=CVAT_GT_SCHEMA)

    return ds.map_batches(build, batch_format="pyarrow")


def cvat_gt_build(sf_dir: str = ""):
    """Driver query over the committed sample annotations (``sf_dir``
    unused, as for the other raw-fixture queries)."""
    return build_cvat_gt(SAMPLE_XML)


# ---------------------------------------------------------------------------
# CVAT pre-annotation WRITER (the other half of the round trip;
# reference dataset_builders/cvat_preannotation_builder.py +
# datamodels/cvat_types.py)
# ---------------------------------------------------------------------------


def spans_to_cvat_image_xml(doc_id: str, spans: list[dict],
                            boxes: list[dict], *, img_id: int,
                            width: float, height: float) -> str:
    """One annotated page → CVAT ``<image>`` element.

    Field layout follows the reference emitters: ``<image id name width
    height>`` (cvat_types.py:195-218 ``AnnotatedImage.to_cvat``) wrapping
    one ``<box label source="docling" occluded="0" xtl ytl xbr ybr
    z_order>`` per element with z_order = element index
    (cvat_types.py:156-157 ``AnnotationBBox.to_cvat``). Two additions
    close the loop with THIS repo's reader (the reference reads text
    from the PDF instead, a stubbed backend here): a ``<attribute
    name="text">`` child per box, and a ``reading_order`` polyline
    through the box centers in span order (the line_annotations slot
    the reference models at cvat_types.py:161-165 but emits only when
    ``lines=True``). Built with ElementTree so attribute text is
    escaped correctly."""
    import xml.etree.ElementTree as _ET

    img = _ET.Element("image", {
        "id": str(img_id), "name": doc_id,
        "width": str(width), "height": str(height),
    })
    centers = []
    for i, (s, b) in enumerate(zip(spans, boxes)):
        box = _ET.SubElement(img, "box", {
            "label": s["kind"], "source": "docling", "occluded": "0",
            "xtl": repr(float(b["l"])), "ytl": repr(float(b["t"])),
            "xbr": repr(float(b["r"])), "ybr": repr(float(b["b"])),
            "z_order": str(i),
        })
        attr = _ET.SubElement(box, "attribute", {"name": "text"})
        attr.text = s["text"]
    # reading-order anchor points: the center is NOT injective under
    # the reader's smallest-area find_box (a figure box whose center
    # lies inside its nested caption box would resolve to the caption,
    # silently dropping the figure span on round-trip). For each box,
    # pick the first deterministic candidate point that find_box maps
    # back to THAT box; exact duplicate boxes stay unresolvable (the
    # reference reader's skip semantics apply).
    ltrb = [
        {"l": float(b["l"]), "t": float(b["t"]),
         "r": float(b["r"]), "b": float(b["b"])}
        for b in boxes[: len(spans)]
    ]
    for i in range(len(ltrb)):
        centers.append(_anchor_point(ltrb, i))
    if centers:
        _ET.SubElement(img, "polyline", {
            "label": "reading_order", "source": "docling", "occluded": "0",
            "points": ";".join(f"{x},{y}" for x, y in centers),
        })
    return _ET.tostring(img, encoding="unicode")


def _anchor_point(boxes: list[dict], i: int) -> tuple[float, float]:
    """First candidate point inside box ``i`` that ``find_box`` resolves
    back to ``i`` (center, then inset corners/edge midpoints); falls
    back to the center when nothing disambiguates (exact duplicates)."""
    b = boxes[i]
    cx, cy = (b["l"] + b["r"]) / 2.0, (b["t"] + b["b"]) / 2.0
    dx = max((b["r"] - b["l"]) * 0.02, 1e-6)
    dy = max((b["b"] - b["t"]) * 0.02, 1e-6)
    candidates = [
        (cx, cy),
        (b["l"] + dx, b["t"] + dy), (b["r"] - dx, b["t"] + dy),
        (b["l"] + dx, b["b"] - dy), (b["r"] - dx, b["b"] - dy),
        (cx, b["t"] + dy), (cx, b["b"] - dy),
        (b["l"] + dx, cy), (b["r"] - dx, cy),
    ]
    for pt in candidates:
        if find_box(boxes, pt) == i:
            return pt
    return (cx, cy)


def write_cvat_preannotations(ds, out_dir: str, *, num_buckets: int = 2,
                              width: float = 612.0, height: float = 792.0):
    """Dataset of (doc_id, spans, boxes) rows → bucketed CVAT task
    files ``task_{NN}_preannotate.xml`` (the reference's bucket layout,
    cvat_preannotation_builder.py:713-719, with its XML declaration +
    ``<annotations>`` wrapper).

    Distribution: pages hash-bucket on ``doc_id`` and each bucket's
    file is rendered and written INSIDE its map_groups task — the
    driver never sees page payloads, only (bucket, path, n_images)
    receipts; buckets are the resume unit (one file per bucket, the
    partitioned-sink rule). img_id is the page's rank within its
    bucket (deterministic: buckets sort by doc_id)."""
    import pandas as pd

    from ..functions.groups import bucketed_group_apply
    from pathlib import Path as _P

    _P(out_dir).mkdir(parents=True, exist_ok=True)

    def render_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        import zlib

        bucket = zlib.crc32(g["doc_id"].iloc[0].encode()) % num_buckets
        parts = ['<?xml version="1.0" encoding="utf-8"?>', "<annotations>"]
        for i, row in enumerate(g.itertuples(index=False)):
            parts.append(spans_to_cvat_image_xml(
                row.doc_id, list(row.spans), list(row.boxes),
                img_id=i, width=width, height=height,
            ))
        parts.append("</annotations>")
        path = _P(out_dir) / f"task_{bucket:02}_preannotate.xml"
        path.write_text("\n".join(parts))
        return pd.DataFrame(
            {"bucket": [int(bucket)], "path": [str(path)],
             "n_images": [len(g)]}
        )

    import numpy as np
    import pyarrow.compute as _pc

    def add_bucket(t: pa.Table) -> pa.Table:
        import zlib

        b = np.array(
            [zlib.crc32(d.encode()) % num_buckets
             for d in t["doc_id"].to_pylist()], np.int64,
        )
        return t.append_column("__task_bucket", pa.array(b))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__task_bucket").map_groups(
        lambda g: render_bucket(g.drop(columns=["__task_bucket"])),
        batch_format="pandas",
    )


def cvat_preannotation_roundtrip(sf_dir: str = ""):
    """Driver query: DPBench GT spans → CVAT pre-annotation task files
    → re-parsed through THIS module's reader. Returns the re-read GT
    rows; tests assert span-sequence equality with the source."""
    import tempfile

    from .dpbench import SAMPLE_DIR as _DP_SAMPLE
    from .dpbench import build_dpbench_gt

    gt = build_dpbench_gt(_DP_SAMPLE).select_columns(
        ["doc_id", "spans", "boxes"]
    )
    out_dir = tempfile.mkdtemp(prefix="cvat_preannot_", dir="/tmp")
    receipts = write_cvat_preannotations(gt, out_dir).to_pandas()
    return build_cvat_gt(sorted(receipts["path"]))
