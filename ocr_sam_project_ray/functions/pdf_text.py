"""REAL-PDF text extractor + layout analysis — the engine's second payload
path, stdlib only (round-3 replacement of the round-1/2 ``@y,x`` fixture
format with genuine PDF byte parsing).

Role parity: the reference's core competence is real PDF bytes — PyPDF2
page splitting (/root/reference/src/services/pdf_service.py:36-147),
page-range reassembly (pdf_service.py:179-207), header/EOF validation
(/root/reference/src/shared/validators.py:22-44) and the OCR block-to-field
mapping (src/services/ocr_service.py:52-124). This module performs the
structural half locally and deterministically:

STRUCTURE (the real-PDF part):
1. object scan: ``N 0 obj … endobj`` slices (tolerant of xref damage — the
   scan never trusts offsets);
2. trailer ``/Root`` → catalog ``/Pages`` → RECURSIVE page-tree walk over
   ``/Kids`` (intermediate /Pages nodes supported), giving document page
   order — the same tree PyPDF2 walks for the reference's splitter;
3. per page: ``/Contents`` (single ref or array), stream bytes between
   ``stream``/``endstream``, ``/FlateDecode`` inflated via ``zlib``;
4. content-stream interpretation: tokenizer for literal strings (with
   escapes + octal), hex strings, numbers, names and operators; text-state
   machine over ``BT/ET``, ``Tf`` (size), ``TL``, ``Tm`` (translation),
   ``Td``, ``TD``, ``T*``, ``Tj``, ``'``, ``TJ`` → positioned records
   (y_down, x, size, text); TJ array pieces concatenate into one record.

LAYOUT (unchanged analysis pass from round 2, now over real coordinates —
y converted to top-down reading space, y_down = PAGE_H − y):
1. reading order: sort by (y_down, x);
2. MULTI-COLUMN: 1-D cluster on x, split at gaps ≥ ``COLUMN_GAP``;
   columns emitted left-to-right (a naive global sort would interleave);
3. HEADER/FOOTER suppression: a record in the top band (y_down ≤
   HEADER_Y) or bottom band (y_down ≥ FOOTER_Y) whose (band, text)
   repeats on ≥ 2 pages is boilerplate and dropped everywhere;
   single-page documents keep their bands (no repetition evidence);
4. FINE-PRINT suppression: font size < ``MIN_SIZE`` (watermarks) dropped.

Output text = record texts joined with "\\n" across pages (same canonical
shape as the HTML path — downstream segment/annotate stages stay
payload-agnostic). Tolerant: undecodable bytes replace deterministically;
structurally broken files yield "" (poison rows never raise).
"""

from __future__ import annotations

import re
import zlib

PDF_HEADER = b"%PDF-"
PDF_EOF = b"%%EOF"

PAGE_H = 792           # US Letter, must match pdf_build.PAGE_H

HEADER_Y = 50          # y_down ≤ 50 (y ≥ 742) = header band
FOOTER_Y = 700         # y_down ≥ 700 (y ≤ 92) = footer band
MIN_SIZE = 6           # smaller = watermark / fine print → dropped
COLUMN_GAP = 100       # x gap (points) that separates layout columns
MIN_COLUMN_RECORDS = 2  # a "column" with 1 record is a margin note, not a column

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]])*)\]")
_ID_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def is_pdf_like(payload: bytes) -> bool:
    return bool(payload) and payload.startswith(PDF_HEADER)


# ---------------------------------------------------------------------------
# structure: objects → page tree → content streams
# ---------------------------------------------------------------------------

def _scan_objects(payload: bytes) -> dict[int, bytes]:
    """{object number: body bytes} via a linear ``obj``/``endobj`` scan —
    deliberately independent of the xref table (torn files still parse).
    Stream objects with a literal ``/Length`` jump over their data exactly,
    so compressed bytes that happen to contain ``obj``/``endobj`` byte
    patterns can neither spawn fake objects nor truncate real ones."""
    objects: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(payload, pos)
        if m is None:
            break
        body_start = m.end()
        head = payload[body_start : body_start + 256]
        sm = re.search(rb"stream\r?\n", head)
        lm = re.search(rb"/Length\s+(\d+)\b", head)
        eo = head.find(b"endobj")
        if sm and (0 <= eo < sm.start()):
            sm = None  # the 'stream' belongs to a LATER object
        if sm and lm:
            data_end = body_start + sm.end() + int(lm.group(1))
            end = payload.find(b"endobj", data_end)
        else:
            end = payload.find(b"endobj", body_start)
        if end < 0:
            break  # torn tail: ignore the unterminated object
        objects.setdefault(int(m.group(1)), payload[body_start:end])
        pos = end + len(b"endobj")
    return objects


def _ref(body: bytes, name: bytes):
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _page_order(objects: dict[int, bytes], root: int) -> list[int]:
    """Recursive /Kids walk from the catalog's /Pages — document page
    order, nested intermediate /Pages nodes included."""
    pages_root = _ref(objects.get(root, b""), b"Pages")
    order: list[int] = []
    seen: set[int] = set()

    def walk(oid):
        if oid is None or oid in seen or oid not in objects:
            return
        seen.add(oid)
        body = objects[oid]
        if re.search(rb"/Type\s*/Pages\b", body):
            m = _KIDS_RE.search(body)
            if m:
                for r in _ID_REF_RE.finditer(m.group(1)):
                    walk(int(r.group(1)))
        elif re.search(rb"/Type\s*/Page\b", body):
            order.append(oid)

    walk(pages_root)
    return order


def _content_refs(page_body: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*\[((?:[^\[\]])*)\]", page_body)
    if m:
        return [int(r.group(1)) for r in _ID_REF_RE.finditer(m.group(1))]
    r = _ref(page_body, b"Contents")
    return [r] if r is not None else []


def _stream_bytes(body: bytes) -> bytes:
    s = body.find(b"stream")
    if s < 0:
        return b""
    dict_part = body[:s]
    s += len(b"stream")
    if body[s : s + 2] == b"\r\n":
        s += 2
    elif body[s : s + 1] in (b"\n", b"\r"):
        s += 1
    lm = re.search(rb"/Length\s+(\d+)\b", dict_part)
    if lm:  # exact slice — binary data may legally contain 'endstream'
        data = body[s : s + int(lm.group(1))]
    else:
        e = body.rfind(b"endstream")
        if e < 0:
            return b""
        data = body[s:e]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith((b"\n", b"\r")):
            data = data[:-1]
    if re.search(rb"/Filter\s*/FlateDecode\b", body[: body.find(b"stream")]):
        try:
            data = zlib.decompress(data)
        except zlib.error:
            return b""
    return data


# ---------------------------------------------------------------------------
# content-stream tokenizer + text-state interpreter
# ---------------------------------------------------------------------------

_OCTAL = re.compile(rb"[0-7]{1,3}")
_NUM = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_DELIMS = b"()<>[]{}/%"


def _read_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string starting at ``(``; returns (raw bytes, index past)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in (b"n", b"r", b"t", b"b", b"f"):
                out += {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\f"}[nxt]
                i += 2
            elif nxt in (b"(", b")", b"\\"):
                out += nxt
                i += 2
            elif nxt == b"\n":
                i += 2  # line continuation
            else:
                m = _OCTAL.match(data, i + 1)
                if m:
                    out.append(int(m.group(0), 8) & 0xFF)
                    i = m.end()
                else:
                    i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


_TOK_RE = re.compile(
    rb"(?P<skip>[\s\x00]+|%[^\r\n]*|<<|>>)"       # ws / comment / dict marks
    rb"|(?P<lit>\((?:[^()\\]|\\.)*\))"            # literal, no nested parens
    rb"|(?P<hex><[0-9A-Fa-f\s]*>)"
    rb"|(?P<mark>[\[\]])"
    rb"|/(?P<name>[^\s\x00()<>\[\]{}/%]*)"
    rb"|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<op>[^\s\x00()<>\[\]{}/%]+)"
    rb"|(?P<other>.)",
    re.DOTALL,
)


def _tokens(data: bytes):
    """Yield ("str", bytes) | ("num", float) | ("name", bytes) |
    ("op", bytes) | ("mark", b"[" / b"]").

    Compiled-scanner fast path: one alternation regex consumes the stream
    in C. Literal strings WITHOUT unescaped nested parentheses (the
    overwhelmingly common case — writers escape delimiters) match as a
    single group; escape decoding runs only when a backslash is present,
    and a literal that fails the regex (legal nested unescaped parens)
    falls back to the character-walk reader. Token-for-token equal to
    ``_tokens_reference`` (equality-tested over the corpus)."""
    for m in _TOK_RE.finditer(data):
        kind = m.lastgroup
        if kind == "skip":
            continue
        if kind == "lit":
            raw = m.group()[1:-1]
            if b"\\" in raw:
                raw = _read_literal(b"(" + raw + b")", 0)[0]
            yield ("str", raw)
        elif kind == "num":
            yield ("num", float(m.group()))
        elif kind == "op":
            yield ("op", m.group())
        elif kind == "name":
            yield ("name", m.group("name"))
        elif kind == "mark":
            yield ("mark", m.group())
        elif kind == "hex":
            hx = re.sub(rb"\s", b"", m.group()[1:-1])
            if len(hx) % 2:
                hx += b"0"
            try:
                yield ("str", bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
        elif m.group() == b"(":  # nested-paren literal → slow reader
            s, end = _read_literal(data, m.start())
            yield ("str", s)
            yield from _tokens(data[end:])
            return
        elif m.group() == b"<" and data.find(b">", m.end()) < 0:
            return  # unterminated hex string: stop (reference parity)
        # any other single hostile byte is skipped (tolerant)


def _tokens_reference(data: bytes):
    """Character-walk tokenizer — the reference implementation the fast
    scanner above is equality-tested against."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == b"%":  # comment to end of line
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _read_literal(data, i)
            yield ("str", s)
        elif c == b"<" and data[i + 1 : i + 2] != b"<":
            j = data.find(b">", i)
            if j < 0:
                return
            hx = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            try:
                yield ("str", bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c in b"[]":
            yield ("mark", c)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and data[j : j + 1] not in _DELIMS and \
                    data[j] not in b" \t\r\n\x00\x0c":
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
        elif c == b"<":  # dict marker inside stream (unused) — skip
            i += 2
        elif c == b">":
            i += 2 if data[i + 1 : i + 2] == b">" else 1
        else:
            m = _NUM.match(data, i)
            if m:
                yield ("num", float(m.group(0)))
                i = m.end()
            else:
                j = i
                while j < n and data[j : j + 1] not in _DELIMS and \
                        data[j] not in b" \t\r\n\x00\x0c":
                    j += 1
                yield ("op", data[i:j])
                i = j if j > i else i + 1


def _interpret_via_tokens(data: bytes) -> list[tuple[int, int, int, str]]:
    """Content stream → records (y_down, x, size, text) — reference
    implementation driven by the ``_tokens`` generator. ``_interpret``
    below inlines the same scanner for speed and is equality-tested
    against this one; it also falls back here when a stream contains a
    nested-unescaped-paren literal (which the fused loop cannot seek
    past). Text state per the PDF spec subset documented in the module
    docstring; only the translation components of Tm are honored (the
    corpus and the reference never rotate/scale text)."""
    records: list[tuple[int, int, int, str]] = []
    stack: list = []
    in_array: list | None = None
    line_x = line_y = 0.0
    size = 10.0
    leading = 0.0
    last_pos: tuple[float, float] | None = None

    def show(text_bytes: bytes) -> None:
        nonlocal last_pos
        t = text_bytes.decode("utf-8", errors="replace")
        if last_pos == (line_x, line_y) and records:
            y, x, s, prev = records[-1]
            records[-1] = (y, x, s, prev + t)  # same point → concatenate
        else:
            records.append(
                (round(PAGE_H - line_y), round(line_x), round(size), t)
            )
        last_pos = (line_x, line_y)

    for kind, val in _tokens(data):
        if kind == "mark":
            in_array = [] if val == b"[" else in_array
            if val == b"]" and in_array is not None:
                stack.append(("array", in_array))
                in_array = None
            continue
        if in_array is not None and kind in ("str", "num"):
            in_array.append((kind, val))
            continue
        if kind in ("str", "num", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == b"Tf":
            if stack and stack[-1][0] == "num":
                size = stack[-1][1]
        elif op == b"TL":
            if stack and stack[-1][0] == "num":
                leading = stack[-1][1]
        elif op == b"Tm":
            nums = [v for k, v in stack[-6:] if k == "num"]
            if len(nums) >= 2:
                line_x, line_y = nums[-2], nums[-1]
        elif op in (b"Td", b"TD"):
            nums = [v for k, v in stack[-2:] if k == "num"]
            if len(nums) == 2:
                if op == b"TD":
                    leading = -nums[1]
                line_x += nums[0]
                line_y += nums[1]
        elif op == b"T*":
            line_y -= leading
        elif op == b"Tj":
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"'":
            line_y -= leading
            if stack and stack[-1][0] == "str":
                show(stack[-1][1])
        elif op == b"TJ":
            if stack and stack[-1][0] == "array":
                pieces = b"".join(
                    v for k, v in stack[-1][1] if k == "str"
                )
                show(pieces)
        elif op in (b"BT", b"ET"):
            last_pos = None
        stack = stack[-8:]  # bound operand memory; ops consume from the top
    return records


def _interpret(data: bytes) -> list[tuple[int, int, int, str]]:
    """Fast fused scanner+interpreter: one ``_TOK_RE`` pass with inline
    dispatch (no per-token generator hop or tuple). Identical output to
    ``_interpret_via_tokens`` (equality-tested over the corpus); bails to
    it when a nested-unescaped-paren literal appears, since the fused
    loop cannot seek the scanner past the slow-path read."""
    records: list[tuple[int, int, int, str]] = []
    stack: list = []
    in_array: list | None = None
    line_x = line_y = 0.0
    size = 10.0
    leading = 0.0
    last_pos: tuple[float, float] | None = None

    def show(text_bytes: bytes) -> None:
        nonlocal last_pos
        t = text_bytes.decode("utf-8", errors="replace")
        if last_pos == (line_x, line_y) and records:
            y, x, s, prev = records[-1]
            records[-1] = (y, x, s, prev + t)  # same point → concatenate
        else:
            records.append(
                (round(PAGE_H - line_y), round(line_x), round(size), t)
            )
        last_pos = (line_x, line_y)

    for m in _TOK_RE.finditer(data):
        g = m.lastgroup
        if g == "skip":
            continue
        if g == "num":
            v = float(m.group())
            (stack if in_array is None else in_array).append(("num", v))
            continue
        if g == "op":
            op = m.group()
            if op == b"Tj":
                if stack and stack[-1][0] == "str":
                    show(stack[-1][1])
            elif op == b"T*":
                line_y -= leading
            elif op == b"Td" or op == b"TD":
                nums = [v for k, v in stack[-2:] if k == "num"]
                if len(nums) == 2:
                    if op == b"TD":
                        leading = -nums[1]
                    line_x += nums[0]
                    line_y += nums[1]
            elif op == b"Tm":
                nums = [v for k, v in stack[-6:] if k == "num"]
                if len(nums) >= 2:
                    line_x, line_y = nums[-2], nums[-1]
            elif op == b"'":
                line_y -= leading
                if stack and stack[-1][0] == "str":
                    show(stack[-1][1])
            elif op == b"TJ":
                if stack and stack[-1][0] == "array":
                    show(b"".join(
                        v for k, v in stack[-1][1] if k == "str"
                    ))
            elif op == b"Tf":
                if stack and stack[-1][0] == "num":
                    size = stack[-1][1]
            elif op == b"TL":
                if stack and stack[-1][0] == "num":
                    leading = stack[-1][1]
            elif op == b"BT" or op == b"ET":
                last_pos = None
            if len(stack) > 8:
                del stack[:-8]  # bound operand memory
            continue
        if g == "lit":
            raw = m.group()[1:-1]
            if b"\\" in raw:
                raw = _read_literal(b"(" + raw + b")", 0)[0]
            (stack if in_array is None else in_array).append(("str", raw))
            continue
        if g == "mark":
            if m.group() == b"[":
                in_array = []
            elif in_array is not None:
                stack.append(("array", in_array))
                in_array = None
            continue
        if g == "hex":
            hx = re.sub(rb"\s", b"", m.group()[1:-1])
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                continue
            (stack if in_array is None else in_array).append(("str", s))
            continue
        if g == "name":
            stack.append(("name", m.group("name")))
            continue
        t = m.group()  # g == "other": hostile single byte
        if t == b"(":
            return _interpret_via_tokens(data)  # nested literal: rare path
        if t == b"<" and data.find(b">", m.end()) < 0:
            break  # unterminated hex string (reference parity)
    return records


def _parse_pages(payload: bytes) -> list[list[tuple[int, int, int, str]]]:
    """Real-PDF structural parse → per-page positioned records."""
    objects = _scan_objects(payload)
    if not objects:
        return []
    root = None
    m = None
    for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", payload):
        pass  # last trailer wins (incremental-update convention)
    if m is not None:
        root = int(m.group(1))
    if root is None:  # no trailer → best effort: any catalog object
        for oid, body in objects.items():
            if re.search(rb"/Type\s*/Catalog\b", body):
                root = oid
                break
    if root is None:
        return []
    pages = []
    for pid in _page_order(objects, root):
        data = b"".join(
            _stream_bytes(objects[c])
            for c in _content_refs(objects[pid])
            if c in objects
        )
        pages.append(_interpret(data))
    return pages


# ---------------------------------------------------------------------------
# layout analysis (round-2 pass, unchanged semantics)
# ---------------------------------------------------------------------------

def _band(y: int) -> str | None:
    if y <= HEADER_Y:
        return "h"
    if y >= FOOTER_Y:
        return "f"
    return None


def _split_columns(
    records: list[tuple[int, int, int, str]]
) -> list[list[tuple[int, int, int, str]]]:
    """1-D cluster on x: partition at gaps ≥ COLUMN_GAP. Conservative: if
    any resulting column holds fewer than MIN_COLUMN_RECORDS records, the
    split is rejected and the page reads as a single column."""
    xs = sorted({r[1] for r in records})
    boundaries = [
        (xs[i - 1] + xs[i]) // 2
        for i in range(1, len(xs))
        if xs[i] - xs[i - 1] >= COLUMN_GAP
    ]
    if not boundaries:
        return [records]
    columns: list[list] = [[] for _ in range(len(boundaries) + 1)]
    for r in records:
        idx = sum(1 for b in boundaries if r[1] > b)
        columns[idx].append(r)
    if any(len(c) < MIN_COLUMN_RECORDS for c in columns):
        return [records]
    return columns


def extract_pdf_like_text(payload: bytes) -> str:
    """payload bytes → canonical extracted text (byte-identical contract)."""
    if not payload:
        return ""
    try:
        pages = _parse_pages(payload)
    except Exception:  # structurally hostile bytes → empty, never raise
        return ""

    # fine-print suppression
    pages = [[r for r in page if r[2] >= MIN_SIZE] for page in pages]

    # header/footer suppression: (band, text) repeated on >= 2 pages
    band_pages: dict[tuple[str, str], set[int]] = {}
    for pno, page in enumerate(pages):
        for y, _x, _s, t in page:
            b = _band(y)
            if b is not None:
                band_pages.setdefault((b, t), set()).add(pno)
    boiler = {key for key, pnos in band_pages.items() if len(pnos) >= 2}

    out_lines: list[str] = []
    for page in pages:
        kept = [
            r for r in page
            if _band(r[0]) is None or (_band(r[0]), r[3]) not in boiler
        ]
        if not kept:
            continue
        for column in _split_columns(kept):
            column.sort(key=lambda r: (r[0], r[1]))
            out_lines.extend(r[3] for r in column)
    return "\n".join(out_lines)


# explicit alias: the payload path is now REAL PDF parsing
extract_pdf_text = extract_pdf_like_text
