"""Minimal from-scratch PDF writer + text extractor — stdlib only.

The reference parses PDFs through docling's DoclingParseV4 backend
(utils/utils.py:98-159 ``get_input_document``/``add_pages_to_true_doc``;
cli/main.py:774-821 PDF page slicing) — native parser libraries that
cannot ship in this container. But the PDF *text layer* itself (ISO
32000 / the public Adobe PDF 1.7 spec) needs nothing beyond stdlib
``zlib`` + ``re``:

* ``encode_pdf`` — writer for text-only documents: page tree, one
  Helvetica font, per-page Flate-compressed (or raw) content streams of
  ``BT/Tf/Tm/Td/TD/T*/Tj/TJ/'/" ... ET`` operators, correct xref table
  + trailer. Deterministic bytes (fixed zlib level) so fixtures built
  with it are committable.
* ``extract_pdf_text`` — the parser: object scanner (``N 0 obj …
  endobj``), Flate/raw stream decode, page-tree walk (``/Root →
  /Pages → /Kids``) for page order, and a content-stream tokenizer
  implementing the text-positioning machine of PDF §9.4: ``BT`` resets
  the text/line matrices, ``Td/TD/Tm/T*`` move them, ``TL`` sets
  leading, ``Tf`` sets the size, ``Tj/TJ/'/"`` show text. Literal
  strings support the full escape set (octal, line-continuation,
  balanced parens); hex strings are supported. Emits one record per
  show-op: ``(page_no, x, y, size, text)`` in content-stream order.

Encoding note: text is carried as Latin-1 code points (the writer
escapes what it must); full CID/ToUnicode font cmaps are out of scope —
the extractor reports the code points the content stream actually
contains, which for the fixtures this repo generates is exact.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------- writer


def _esc_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1", errors="replace"):
        if ch in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([ch])
        elif ch < 0x20 or ch > 0x7E:
            out += b"\\%03o" % ch
        else:
            out.append(ch)
    return bytes(out)


def _fmt(v: float) -> bytes:
    """PDF number: trim trailing zeros, keep determinism."""
    if float(v) == int(v):
        return b"%d" % int(v)
    return (b"%.4f" % float(v)).rstrip(b"0").rstrip(b".")


def encode_pdf(pages: list[dict], *, compress: bool = True) -> bytes:
    """Write a text-only PDF.

    Each page dict: ``{"width": pt, "height": pt, "texts": [
    {"x": pt, "y": pt, "size": pt, "text": str}, ...]}``. Show-ops are
    emitted as ``Tm``-positioned ``Tj`` ops in list order.
    """
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    # object layout: 1 Catalog, 2 Pages, 3 Font, then (page, content)*
    page_ids = [4 + 2 * i for i in range(n_pages)]
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, page in enumerate(pages):
        w = _fmt(page.get("width", 612))
        h = _fmt(page.get("height", 792))
        pid, cid = page_ids[i], page_ids[i] + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 " + w + b" "
            + h + b"] /Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % cid
        )
        parts = [b"BT"]
        size = None
        for t in page.get("texts", []):
            if t["size"] != size:
                size = t["size"]
                parts.append(b"/F1 " + _fmt(size) + b" Tf")
            parts.append(
                b"1 0 0 1 " + _fmt(t["x"]) + b" " + _fmt(t["y"]) + b" Tm"
            )
            parts.append(b"(" + _esc_string(t["text"]) + b") Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            body = zlib.compress(content, 6)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
        else:
            body = content
            head = b"<< /Length %d >>" % len(body)
        objs.append(head + b"\nstream\n" + body + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------------- extractor

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


def _scan_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """object number → (dict/head bytes, raw stream bytes or None).

    Linear scan for ``N G obj … endobj`` — no xref needed (robust to
    the incremental-update PDFs where the xref is stale; the last
    definition of an object number wins, matching update semantics)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end < 0:
            continue
        body = data[start:end]
        sm = re.search(rb"stream(\r\n|\n|\r)", body)
        if sm:
            head = body[: sm.start()]
            raw = body[sm.end():]
            # A direct /Length is authoritative (PDF §7.3.8.1) — a
            # trailing-EOL heuristic cannot distinguish stream bytes
            # that ARE 0x0A/0x0D (~1/128 Flate streams) from the
            # optional EOL before `endstream`, and truncating those
            # corrupts the deflate data.
            length = _dict_value(head, b"Length")
            if length is not None and length.isdigit():
                raw = raw[: int(length)]
            else:  # indirect /Length: fall back, strip at most ONE EOL
                se = raw.rfind(b"endstream")
                if se >= 0:
                    raw = raw[:se]
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith((b"\n", b"\r")):
                    raw = raw[:-1]
            objs[int(m.group(1))] = (head, raw)
        else:
            objs[int(m.group(1))] = (body, None)
    return objs


def _dict_value(head: bytes, key: bytes) -> bytes | None:
    """Crude single-level lookup of ``/Key value`` in a dict body."""
    m = re.search(rb"/" + key + rb"\s*", head)
    if not m:
        return None
    rest = head[m.end():]
    if rest[:1] == b"[":
        depth = 0
        for i, ch in enumerate(rest):
            if ch == 0x5B:
                depth += 1
            elif ch == 0x5D:
                depth -= 1
                if depth == 0:
                    return rest[: i + 1]
        return rest
    m2 = re.match(rb"(\d+\s+\d+\s+R|/?[^\s/\[\]<>]+)", rest)
    return m2.group(1) if m2 else None


def _stream_bytes(head: bytes, raw: bytes) -> bytes:
    if re.search(rb"/Filter\s*(/FlateDecode\b|\[\s*/FlateDecode\s*\])",
                 head):
        return zlib.decompress(raw)
    if b"/Filter" in head:
        raise ValueError("unsupported PDF stream filter")
    return raw


def _page_order(objs) -> list[int]:
    """Page object numbers in /Root → /Pages → /Kids tree order, falling
    back to definition order of /Type /Page objects."""
    root_pages = None
    for num, (head, _) in objs.items():
        if b"/Type" in head and b"/Catalog" in head:
            v = _dict_value(head, b"Pages")
            if v:
                rm = _REF_RE.match(v)
                if rm:
                    root_pages = int(rm.group(1))
    order: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        head, _ = objs[num]
        if b"/Kids" in head:
            kids = _dict_value(head, b"Kids") or b""
            for rm in _REF_RE.finditer(kids):
                walk(int(rm.group(1)), seen)
        elif b"/Page" in head:
            order.append(num)

    if root_pages is not None:
        walk(root_pages, set())
    if not order:  # damaged/absent tree: definition order
        order = [
            num for num, (head, _) in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", head)
        ]
    return order


def _parse_string(buf: bytes, i: int) -> tuple[str, int]:
    """Literal string starting at '(' → (decoded text, index past ')')."""
    assert buf[i] == 0x28
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        ch = buf[i]
        if ch == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\f"}[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while (i < n and len(oct_digits) < 3
                       and 0x30 <= buf[i] <= 0x37):
                    oct_digits.append(buf[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:  # unknown escape: literal char
                out.append(e)
                i += 1
        elif ch == 0x28:
            depth += 1
            out.append(ch)
            i += 1
        elif ch == 0x29:
            depth -= 1
            if depth:
                out.append(ch)
            i += 1
        else:
            out.append(ch)
            i += 1
    return out.decode("latin-1"), i


def _parse_hex_string(buf: bytes, i: int) -> tuple[str, int]:
    assert buf[i] == 0x3C
    j = buf.find(b">", i + 1)
    if j < 0:
        j = len(buf)
    hexs = re.sub(rb"\s", b"", buf[i + 1: j])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii")).decode("latin-1"), j + 1


_NUM_RE = re.compile(rb"[-+]?(\d+\.?\d*|\.\d+)")
_NAME_RE = re.compile(rb"/[^\s/\[\]<>()]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokenize_content(buf: bytes):
    """Yield ('num', float) / ('str', text) / ('name', bytes) /
    ('op', bytes) / ('[', None) / (']', None) tokens."""
    i = 0
    n = len(buf)
    while i < n:
        ch = buf[i]
        if ch in b" \t\r\n\x00\x0c":
            i += 1
        elif ch == 0x25:  # % comment → end of line
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif ch == 0x28:
            s, i = _parse_string(buf, i)
            yield ("str", s)
        elif ch == 0x3C:
            if buf[i: i + 2] == b"<<":  # inline dict (BDC etc.) — skip
                depth = 0
                while i < n:
                    if buf[i: i + 2] == b"<<":
                        depth += 1
                        i += 2
                    elif buf[i: i + 2] == b">>":
                        depth -= 1
                        i += 2
                        if depth == 0:
                            break
                    else:
                        i += 1
            else:
                s, i = _parse_hex_string(buf, i)
                yield ("str", s)
        elif ch == 0x5B:
            yield ("[", None)
            i += 1
        elif ch == 0x5D:
            yield ("]", None)
            i += 1
        elif ch == 0x2F:
            m = _NAME_RE.match(buf, i)
            yield ("name", m.group())
            i = m.end()
        else:
            m = _NUM_RE.match(buf, i)
            if m and m.end() > i:
                yield ("num", float(m.group()))
                i = m.end()
                continue
            m = _OP_RE.match(buf, i)
            if m:
                yield ("op", m.group())
                i = m.end()
            else:
                i += 1  # unknown byte — skip


def _extract_page_text(content: bytes, page_no: int) -> list[dict]:
    """Run the PDF §9.4 text machine over one content stream."""
    recs: list[dict] = []
    stack: list = []
    in_array: list | None = None
    size = 0.0
    leading = 0.0
    # text matrix (e, f) and line matrix (le, lf); scale terms tracked
    # for Tm but show-position uses the translation components
    tmx = tmy = lmx = lmy = 0.0

    def show(text: str) -> None:
        if text:
            recs.append(
                {"page_no": page_no, "x": round(tmx, 4),
                 "y": round(tmy, 4), "size": size, "text": text}
            )

    for kind, val in _tokenize_content(content):
        if kind == "[":
            in_array = []
        elif kind == "]":
            stack.append(in_array)
            in_array = None
        elif kind in ("num", "str", "name"):
            (in_array if in_array is not None else stack).append(
                val if kind != "name" else val
            )
        else:  # operator
            op = val
            if op == b"BT":
                tmx = tmy = lmx = lmy = 0.0
            elif op == b"Tf":
                if stack:
                    size = float(stack[-1])
            elif op == b"TL":
                if stack:
                    leading = float(stack[-1])
            elif op == b"Td" or op == b"TD":
                if len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    if op == b"TD":
                        leading = -ty
                    lmx += tx
                    lmy += ty
                    tmx, tmy = lmx, lmy
            elif op == b"Tm":
                if len(stack) >= 6:
                    tmx, tmy = float(stack[-2]), float(stack[-1])
                    lmx, lmy = tmx, tmy
            elif op == b"T*":
                lmy -= leading
                tmx, tmy = lmx, lmy
            elif op == b"Tj":
                if stack and isinstance(stack[-1], str):
                    show(stack[-1])
            elif op == b"'":
                lmy -= leading
                tmx, tmy = lmx, lmy
                if stack and isinstance(stack[-1], str):
                    show(stack[-1])
            elif op == b'"':
                lmy -= leading
                tmx, tmy = lmx, lmy
                if stack and isinstance(stack[-1], str):
                    show(stack[-1])
            elif op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    text = "".join(
                        s for s in stack[-1] if isinstance(s, str)
                    )
                    show(text)
            stack.clear()
    return recs


def media_box(head: bytes) -> tuple[float, float]:
    v = _dict_value(head, b"MediaBox")
    if v:
        nums = [float(x) for x in _NUM_RE.findall(v)]
        if len(nums) >= 4:
            return nums[2] - nums[0], nums[3] - nums[1]
    return 612.0, 792.0


def pdf_page_sizes(data: bytes) -> list[dict]:
    """One entry per page in page-tree order (1-based): ``{"page_no",
    "page_w", "page_h"}`` — including pages with NO text show-ops.
    Page enumeration must come from the page TREE, not from extracted
    text records: a record-derived page set silently drops blank pages
    (which are legal and round-trip through the writer)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _scan_objects(data)
    out: list[dict] = []
    for page_no, num in enumerate(_page_order(objs), start=1):
        w, h = media_box(objs[num][0])
        out.append({"page_no": page_no, "page_w": w, "page_h": h})
    return out


def extract_pdf_text(data: bytes) -> list[dict]:
    """All text show-ops of a PDF: ``{"page_no", "x", "y", "size",
    "text", "page_w", "page_h"}`` — pages in page-tree order (1-based),
    records in content-stream order within a page."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs = _scan_objects(data)
    recs: list[dict] = []
    for page_no, num in enumerate(_page_order(objs), start=1):
        head, _ = objs[num]
        w, h = media_box(head)
        contents = _dict_value(head, b"Contents") or b""
        parts: list[bytes] = []
        for rm in _REF_RE.finditer(contents):
            cnum = int(rm.group(1))
            if cnum in objs:
                chead, craw = objs[cnum]
                if craw is not None:
                    parts.append(_stream_bytes(chead, craw))
        for r in _extract_page_text(b"\n".join(parts), page_no):
            r["page_w"] = w
            r["page_h"] = h
            recs.append(r)
    return recs
