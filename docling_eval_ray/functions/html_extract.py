"""HTML → span sequence with Readability-style boilerplate scoring.

The north-star extraction capability on raw markup: parse the DOM
(stdlib ``html.parser``; no lxml/bs4 in this container), walk block
elements in document order, score each block by text density vs link
density (the public Readability/boilerpipe heuristics: navigation and
chrome have short texts dominated by anchor text), and emit the
surviving blocks as canonical spans ``(kind, text, media_ref, offset)``.

Kind mapping: h1 → title, h2-h6 → section_header, li → list_item,
figcaption → caption, pre/code → code, img → picture (media_ref from
src), table → table placeholder, everything else text-bearing → text.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# module-scope: synth_html_for_doc runs inside worker map_batches fns
from ..sources.interleaved import chunk_plan

_WS = re.compile(r"\s+")

#: td/th are NOT block tags here: cell text must aggregate into the
#: enclosing <table> block (which becomes one table-placeholder span),
#: not leak into the main-content text stream
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
    "blockquote", "figcaption", "article", "section",
}
_SKIP_SUBTREES = {"script", "style", "nav", "header", "footer", "aside"}
_KIND_BY_TAG = {
    "h1": "title",
    "h2": "section_header",
    "h3": "section_header",
    "h4": "section_header",
    "h5": "section_header",
    "h6": "section_header",
    "li": "list_item",
    "figcaption": "caption",
    "pre": "code",
}

#: boilerplate thresholds (Readability-style): a block whose anchor-text
#: fraction exceeds LINK_DENSITY_MAX, or whose text is shorter than
#: MIN_TEXT_CHARS with any link at all, is chrome
LINK_DENSITY_MAX = 0.33
MIN_TEXT_CHARS = 8


class _Block:
    __slots__ = ("tag", "text", "link_text", "media_ref")

    def __init__(self, tag: str):
        self.tag = tag
        self.text: list[str] = []
        self.link_text: list[str] = []
        self.media_ref = ""


#: non-container blocks whose end tag is optional in HTML: a new block
#: start implies their end (real pages routinely omit </p>); <li> and
#: <figcaption> are handled separately — they may legally CONTAIN
#: blocks and end only at a sibling item or their explicit close
_IMPLIED_CLOSE = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "pre"}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__()
        self.blocks: list[_Block] = []
        self._stack: list[_Block] = []
        self._skip_depth = 0
        self._anchor_depth = 0
        self._table_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        elif tag == "img":
            if self._table_depth:
                return  # images inside tables stay with the table
            src = dict(attrs).get("src", "")
            blk = _Block("img")
            blk.media_ref = src
            self.blocks.append(blk)
        elif tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self.blocks.append(_Block("table"))
                self._stack.append(self.blocks[-1])
        elif tag in _BLOCK_TAGS:
            if self._table_depth:
                return  # blocks inside cells are transparent: text
                # aggregates into the enclosing table block
            # item containers (<li>/<figcaption>) legally CONTAIN
            # blocks: a nested <p>/<div> is transparent — its text
            # belongs to the item (else '<li><p>x</p></li>' loses the
            # list_item kind); only a SIBLING item implies their end
            if self._stack and self._stack[-1].tag in (
                "li", "figcaption"
            ):
                if tag in ("li", "figcaption"):
                    self._stack.pop()
                else:
                    return
            # implied end: <p>/<h*>/<pre> cannot contain blocks — a new
            # block closes them (otherwise later body text is appended
            # to a stale block forever)
            while self._stack and self._stack[-1].tag in _IMPLIED_CLOSE:
                self._stack.pop()
            blk = _Block(tag)
            self.blocks.append(blk)
            self._stack.append(blk)

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        elif tag == "table":
            if self._table_depth:
                self._table_depth -= 1
                if self._table_depth == 0 and self._stack and (
                    self._stack[-1].tag == "table"
                ):
                    self._stack.pop()
        elif tag in _BLOCK_TAGS and not self._table_depth:
            # pop up to and including the nearest matching open block
            # (mismatched markup: intermediates were implicitly closed)
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i].tag == tag:
                    del self._stack[i:]
                    break

    def handle_data(self, data):
        if self._skip_depth or not self._stack:
            return
        blk = self._stack[-1]
        blk.text.append(data)
        if self._anchor_depth:
            blk.link_text.append(data)


def html_to_spans(html: str, *, link_density_max: float = LINK_DENSITY_MAX,
                  min_text_chars: int = MIN_TEXT_CHARS) -> list[dict]:
    """Extract the main-content span sequence from raw HTML."""
    p = _Extractor()
    p.feed(html)
    spans: list[dict] = []
    pic = 0
    for blk in p.blocks:
        if blk.tag == "img":
            spans.append(
                {
                    "kind": "picture",
                    "text": "",
                    "media_ref": blk.media_ref or f"pic/{pic}",
                    "offset": len(spans),
                }
            )
            pic += 1
            continue
        text = _WS.sub(" ", "".join(blk.text)).strip()
        if blk.tag == "table":
            spans.append(
                {
                    "kind": "table",
                    "text": text,
                    "media_ref": f"table/{len(spans)}",
                    "offset": len(spans),
                }
            )
            continue
        if not text:
            continue
        link_len = len(_WS.sub(" ", "".join(blk.link_text)).strip())
        density = link_len / len(text)
        kind = _KIND_BY_TAG.get(blk.tag, "text")
        if kind == "text":
            if density > link_density_max:
                continue  # navigation chrome
            if len(text) < min_text_chars and link_len > 0:
                continue  # short link stub
        spans.append(
            {"kind": kind, "text": text, "media_ref": "", "offset": len(spans)}
        )
    return spans


def synth_html_for_doc(doc_id: int, text: str) -> str:
    """Deterministic HTML rendition of a document (pure function), with
    realistic chrome: nav bar, header/footer, sidebar links, inline
    anchors — so the extractor has real boilerplate to strip."""
    words = text.split()
    parts = [
        "<html><head><style>.x{}</style>",
        "<script>var t=1;</script></head><body>",
        '<nav><a href="/">home</a> <a href="/a">archive</a> '
        '<a href="/c">contact</a></nav>',
        f"<header>corpus {doc_id % 7} masthead</header>",
        f"<h1>{' '.join(words[:3]) if words else 'untitled'}</h1>",
    ]
    for r, chunk, para in chunk_plan(doc_id, words):
        if r == 0:
            parts.append(f"<h2>{chunk}</h2>")
        elif r == 1:
            parts.append(f"<li>{chunk}</li>")
        elif r == 2:
            parts.append(f'<img src="pic/{doc_id}/{para}">')
            parts.append(f"<figcaption>{chunk}</figcaption>")
        elif r == 3:
            parts.append(
                '<div><a href="/x">more</a> <a href="/y">links</a> '
                f'<a href="/z">{chunk.split()[0]}</a></div>'
            )
        else:
            parts.append(f"<p>{chunk}</p>")
    parts.append('<aside><a href="/ads">sponsored</a></aside>')
    parts.append(f"<footer>page 1 — doc {doc_id}</footer></body></html>")
    return "".join(parts)


def html_extraction(sf_dir: str):
    """Rows-only query: deterministic HTML rendition of each document →
    DOM boilerplate-stripped span sequence (the raw-markup flagship)."""
    import pyarrow as pa
    import ray.data as rd

    from ..datamodel.schema import SPAN_STRUCT

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            html = synth_html_for_doc(int(did), text)
            rows.append(
                {"doc_id": f"doc-{int(did):06d}",
                 "spans": html_to_spans(html)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [pa.field("doc_id", pa.string()),
                 pa.field("spans", pa.list_(SPAN_STRUCT))]
            ),
        )

    return ds.map_batches(fn, batch_format="pyarrow")
