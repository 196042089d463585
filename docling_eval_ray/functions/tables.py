"""Table structure kernels: HTML grid parser, OTSL parser, TEDS.

Reference semantics:
* HTML ``<table>`` → (row, col, rowspan, colspan, text) grid honoring
  span occupancy — utils/utils.py:162-244 (reference uses BeautifulSoup;
  this is a stdlib ``html.parser`` reimplementation).
* OTSL token stream (``fcel ecel ched rhed srow lcel ucel xcel nl``) →
  cell grid with span counting — dataset_builders/doclaynet_v2_builder.py:82-254.
* TEDS = 1 − TED(tree(pred), tree(gt)) / max(#nodes) on the HTML trees,
  with td-node rename cost based on span equality + normalized
  cell-text edit distance — evaluators/teds.py:61-129 (reference uses
  APTED; this uses the public Zhang-Shasha algorithm, which computes the
  same unit-cost tree edit distance).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from .textmetrics import edit_distance


# ---------------------------------------------------------------------------
# HTML table → grid
# ---------------------------------------------------------------------------


def _span_attr(attrs: dict, name: str) -> int:
    """rowspan/colspan parse that degrades to 1 on junk values
    (``colspan=""`` / ``colspan="50%"`` occur in scraped HTML; a batch
    kernel must not throw on one bad attribute). Any value that is not a
    plain positive integer — including percentages — degrades to 1
    rather than being coerced (``"50%"`` must NOT become 50: that would
    inflate grid occupancy and TEDS span-mismatch costs)."""
    v = str(attrs.get(name, 1) or "").strip()
    return int(v) if v.isdigit() and int(v) >= 1 else 1


@dataclass
class TableCell:
    row: int
    col: int
    rowspan: int
    colspan: int
    text: str
    is_header: bool = False


class _TableHTMLParser(HTMLParser):
    def __init__(self):
        super().__init__()
        self.rows: list[list[dict]] = []
        self._cell: dict | None = None

    def _flush_cell(self) -> None:
        # </td>/</tr> are OPTIONAL in HTML: a new <td>/<tr> implies the
        # end of the open cell, so flush before opening the next one
        if self._cell is not None:
            if not self.rows:
                self.rows.append([])
            self.rows[-1].append(self._cell)
            self._cell = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "tr":
            self._flush_cell()
            self.rows.append([])
        elif tag in ("td", "th"):
            self._flush_cell()
            self._cell = {
                "rowspan": _span_attr(a, "rowspan"),
                "colspan": _span_attr(a, "colspan"),
                "text": "",
                "is_header": tag == "th",
            }

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag in ("tr", "table"):
            self._flush_cell()

    def close(self):
        super().close()
        self._flush_cell()

    def handle_data(self, data):
        if self._cell is not None:
            self._cell["text"] += data


def parse_html_table(html_str: str) -> list[TableCell]:
    """``<table>`` markup → grid cells with span-aware (row, col)
    anchoring: a pending rowspan occupies its columns in later rows."""
    p = _TableHTMLParser()
    p.feed(html_str)
    p.close()
    occupied: set[tuple[int, int]] = set()
    cells: list[TableCell] = []
    for r, row in enumerate(p.rows):
        c = 0
        for cell in row:
            while (r, c) in occupied:
                c += 1
            cells.append(
                TableCell(
                    row=r,
                    col=c,
                    rowspan=cell["rowspan"],
                    colspan=cell["colspan"],
                    text=cell["text"].strip(),
                    is_header=cell["is_header"],
                )
            )
            for dr in range(cell["rowspan"]):
                for dc in range(cell["colspan"]):
                    occupied.add((r + dr, c + dc))
            c += cell["colspan"]
    return cells


def grid_shape(cells: list[TableCell]) -> tuple[int, int]:
    if not cells:
        return (0, 0)
    return (
        max(c.row + c.rowspan for c in cells),
        max(c.col + c.colspan for c in cells),
    )


# ---------------------------------------------------------------------------
# OTSL → grid
# ---------------------------------------------------------------------------

_OTSL_CELLS = {"fcel", "ecel", "ched", "rhed", "srow"}


def parse_otsl(tokens: list[str] | str) -> list[TableCell]:
    """OTSL token stream → grid cells with span counting.

    ``lcel`` extends the left neighbor's colspan, ``ucel`` the upper
    neighbor's rowspan, ``xcel`` extends a 2-D span; ``nl`` ends a row.
    ``ched``/``rhed`` mark column/row headers, ``fcel``/``ecel``
    full/empty content cells (reference doclaynet_v2_builder.py:82-254).
    """
    if isinstance(tokens, str):
        tokens = tokens.split()
    grid: list[list[str]] = [[]]
    for tok in tokens:
        if tok == "nl":
            grid.append([])
        else:
            grid[-1].append(tok)
    grid = [row for row in grid if row]

    anchor: dict[tuple[int, int], tuple[int, int]] = {}
    cells: dict[tuple[int, int], TableCell] = {}
    for r, row in enumerate(grid):
        for c, tok in enumerate(row):
            if tok in _OTSL_CELLS:
                cell = TableCell(
                    row=r, col=c, rowspan=1, colspan=1,
                    text="" if tok == "ecel" else tok,
                    is_header=tok in ("ched", "rhed"),
                )
                cells[(r, c)] = cell
                anchor[(r, c)] = (r, c)
            elif tok == "lcel":
                a = anchor[(r, c - 1)]
                anchor[(r, c)] = a
                cells[a].colspan = max(cells[a].colspan, c - a[1] + 1)
            elif tok == "ucel":
                a = anchor[(r - 1, c)]
                anchor[(r, c)] = a
                cells[a].rowspan = max(cells[a].rowspan, r - a[0] + 1)
            elif tok == "xcel":
                a = anchor[(r - 1, c - 1)]
                if (r - 1, c) in anchor:
                    a = anchor[(r - 1, c)]
                anchor[(r, c)] = a
                cells[a].rowspan = max(cells[a].rowspan, r - a[0] + 1)
                cells[a].colspan = max(cells[a].colspan, c - a[1] + 1)
    return list(cells.values())


def cells_to_html(cells: list[TableCell]) -> str:
    """Grid cells → minimal ``<table>`` markup (inverse of
    ``parse_html_table``; used to route any grid into TEDS). Cell text
    is HTML-escaped so '<'/'>'/'&' in content round-trips through the
    TEDS tree parser (html.parser unescapes charrefs on parse)."""
    import html as _html
    n_rows, _ = grid_shape(cells)
    by_row: dict[int, list[TableCell]] = {}
    for c in cells:
        by_row.setdefault(c.row, []).append(c)
    parts = ["<table>"]
    for r in range(n_rows):
        parts.append("<tr>")
        for c in sorted(by_row.get(r, []), key=lambda x: x.col):
            tag = "th" if c.is_header else "td"
            attrs = ""
            if c.rowspan > 1:
                attrs += f' rowspan="{c.rowspan}"'
            if c.colspan > 1:
                attrs += f' colspan="{c.colspan}"'
            parts.append(f"<{tag}{attrs}>{_html.escape(c.text)}</{tag}>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# TEDS: Zhang-Shasha tree edit distance over HTML table trees
# ---------------------------------------------------------------------------


@dataclass
class _Node:
    tag: str
    colspan: int | None = None
    rowspan: int | None = None
    text: str | None = None
    children: list["_Node"] = field(default_factory=list)


class _TreeBuilder(HTMLParser):
    """HTML → _Node tree; td/th nodes are leaves carrying spans+text."""

    def __init__(self):
        super().__init__()
        self.root: _Node | None = None
        self._stack: list[_Node] = []
        self._in_cell: _Node | None = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if self._in_cell is not None:
            # a new <td>/<th>/<tr> implies the open cell's end (optional
            # end tags); any other nested markup stays text-only
            if tag in ("td", "th", "tr"):
                self._in_cell = None
            else:
                return
        if tag in ("td", "th"):
            node = _Node("td", _span_attr(a, "colspan"),
                         _span_attr(a, "rowspan"), "")
            if self._stack:
                self._stack[-1].children.append(node)
            self._in_cell = node
        else:
            if tag == "tr" and self._stack and self._stack[-1].tag == "tr":
                self._stack.pop()  # implied </tr>
            node = _Node(tag)
            if self._stack:
                self._stack[-1].children.append(node)
            else:
                self.root = node
            self._stack.append(node)

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            self._in_cell = None
        elif self._stack and self._stack[-1].tag == tag:
            self._in_cell = None
            self._stack.pop()

    def handle_data(self, data):
        if self._in_cell is not None:
            self._in_cell.text += data


def _postorder(root: _Node):
    """Zhang-Shasha preliminaries: postorder nodes + leftmost-leaf index."""
    nodes: list[_Node] = []
    lmld: list[int] = []

    def walk(n: _Node) -> int:
        if not n.children:
            nodes.append(n)
            lmld.append(len(nodes) - 1)
            return len(nodes) - 1
        first = None
        for ch in n.children:
            f = walk(ch)
            if first is None:
                first = lmld[f]
        nodes.append(n)
        lmld.append(first)
        return len(nodes) - 1

    walk(root)
    return nodes, lmld


def _levenshtein(a: str, b: str) -> int:
    # edit_distance is imported at module scope: this runs per-row
    # inside worker TEDS batches, where a runtime relative import dies
    return edit_distance(list(a), list(b))


def _rename_cost(a: _Node, b: _Node, structure_only: bool) -> float:
    """APTED CustomConfig analogue (reference teds.py:29-58): tag or
    span mismatch costs 1; matching td nodes cost the normalized cell
    edit distance (0 when structure_only)."""
    if a.tag != b.tag:
        return 1.0
    if a.tag == "td":
        if a.colspan != b.colspan or a.rowspan != b.rowspan:
            return 1.0
        if structure_only:
            return 0.0
        ta, tb = a.text or "", b.text or ""
        if not ta and not tb:
            return 0.0
        return _levenshtein(ta, tb) / max(len(ta), len(tb))
    return 0.0


def tree_edit_distance(root_a: _Node, root_b: _Node,
                       structure_only: bool) -> float:
    """Zhang-Shasha (1989) tree edit distance with unit insert/delete
    and the TEDS rename cost."""
    an, al = _postorder(root_a)
    bn, bl = _postorder(root_b)
    # keyroots: nodes whose leftmost leaf differs from their parent's
    def keyroots(lmld):
        seen = {}
        for i in range(len(lmld)):
            seen[lmld[i]] = i
        return sorted(seen.values())

    ka, kb = keyroots(al), keyroots(bl)
    td = [[0.0] * len(bn) for _ in range(len(an))]

    for i in ka:
        for j in kb:
            li, lj = al[i], bl[j]
            m, n = i - li + 2, j - lj + 2
            fd = [[0.0] * n for _ in range(m)]
            for x in range(1, m):
                fd[x][0] = fd[x - 1][0] + 1
            for y in range(1, n):
                fd[0][y] = fd[0][y - 1] + 1
            for x in range(1, m):
                for y in range(1, n):
                    ai, bj = li + x - 1, lj + y - 1
                    if al[ai] == li and bl[bj] == lj:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[x - 1][y - 1]
                            + _rename_cost(an[ai], bn[bj], structure_only),
                        )
                        td[ai][bj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1,
                            fd[x][y - 1] + 1,
                            fd[al[ai] - li][bl[bj] - lj] + td[ai][bj],
                        )
    return td[len(an) - 1][len(bn) - 1]


def _count_nodes(n: _Node) -> int:
    return 1 + sum(_count_nodes(c) for c in n.children)


def teds(gt_html: str, pred_html: str, *, structure_only: bool = False) -> float:
    """Tree-Edit-Distance Score ∈ [0, 1] (1 = identical). Mirrors the
    reference normalization 1 − dist/max(#descendant nodes)
    (teds.py:74-84: node count excludes the <table> root).

    Known divergence from the reference: markup nested INSIDE a cell
    (e.g. ``<b>``/``<br>`` within ``<td>``) is treated as cell text —
    the tree has td leaves only — while the reference counts all element
    descendants via ``xpath('.//*')`` and tokenizes cell tags
    (teds.py:86-129). Tables whose cells contain inline markup therefore
    score slightly differently; structure and span semantics match.
    """
    ta, tb = _TreeBuilder(), _TreeBuilder()
    ta.feed(gt_html)
    tb.feed(pred_html)
    if ta.root is None or tb.root is None:
        return 0.0
    n_gt = _count_nodes(ta.root) - 1
    n_pred = _count_nodes(tb.root) - 1
    n = max(n_gt, n_pred)
    if n == 0:
        return 1.0
    dist = tree_edit_distance(tb.root, ta.root, structure_only)
    return max(0.0, 1.0 - dist / n)
