"""Minimal REAL-PDF writer (stdlib only) — the corpus generator's PDF
renderer and the test suite's adversarial-layout builder.

Emits genuine, spec-shaped PDF files: header + binary comment line, numbered
objects (catalog → page tree → page → content stream(s) → font), content
streams as PDF text operators (``BT/ET``, ``Tf``, ``TL``, ``Tm``, ``Td``,
``TD``, ``T*``, ``Tj``, ``'``, ``TJ`` with literal AND hex strings),
optional ``/FlateDecode`` compression (``zlib``), a correct xref table with
byte offsets, and a trailer + ``startxref`` + ``%%EOF``. The parser in
``functions/pdf_text.py`` is never consulted here — expected text is
composed first and this module only encodes it (the generator/extractor
round-trip assert stays a real test of the extractor).

Reference parity anchors: the reference consumes and re-emits real PDF
bytes with PyPDF2 (/root/reference/src/services/pdf_service.py:36-147 page
split, 179-207 page-range reassembly) and validates the ``%PDF-`` header +
``%%EOF`` marker (/root/reference/src/shared/validators.py:22-44) — both
markers are real artifacts of the files built here.

Geometry: US-Letter pages (612×792 points), y-axis UP (PDF convention);
``functions/pdf_text.py`` converts to top-down reading coordinates.
"""

from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)",
        ord("\n"): "\\n", ord("\r"): "\\r", ord("\t"): "\\t"}


def lit_string(s: str) -> str:
    """PDF literal string of the UTF-8 bytes of ``s`` (delimiters escaped,
    non-ASCII bytes written raw — legal in literal strings)."""
    return "(" + s.translate(_ESC) + ")"


def hex_string(s: str) -> str:
    return "<" + s.encode("utf-8").hex() + ">"


def text_block(
    x: float,
    y: float,
    size: int,
    lines: list,
    leading: int = 12,
    relative: bool = True,
    use_td: bool = False,
) -> str:
    """One BT..ET block. ``lines`` entries are either plain strings (shown
    with Tj) or ("tj_array", [piece, kern, piece, ...]) / ("hex", text) /
    ("quote", text) tuples. ``relative=True`` positions the first line with
    Tm and advances with T* (or ``0 -leading Td`` when ``use_td``);
    ``relative=False`` gives every line its own absolute Tm."""
    ops = [f"BT /F1 {size} Tf {leading} TL"]
    for i, entry in enumerate(lines):
        kind, payload = ("tj", entry) if isinstance(entry, str) else entry
        if kind == "quote" and (i == 0 or not relative):
            # ' moves a line BEFORE showing — only valid as a relative
            # continuation line (after Tm/absolute moves it double-shifts)
            kind = "tj"
        if i == 0:
            ops.append(f"1 0 0 1 {_n(x)} {_n(y)} Tm")
        elif not relative:
            ops.append(f"1 0 0 1 {_n(x)} {_n(y - i * leading)} Tm")
        elif kind != "quote":
            ops.append("0 %s Td" % _n(-leading) if use_td else "T*")
        if kind == "tj":
            ops.append(f"{lit_string(payload)} Tj")
        elif kind == "hex":
            ops.append(f"{hex_string(payload)} Tj")
        elif kind == "quote":  # ' : next-line-and-show in one operator
            ops.append(f"{lit_string(payload)} '")
        elif kind == "tj_array":
            parts = []
            for p in payload:
                parts.append(lit_string(p) if isinstance(p, str) else _n(p))
            ops.append("[" + " ".join(parts) + "] TJ")
        else:  # pragma: no cover - builder misuse
            raise ValueError(f"unknown line kind {kind!r}")
    ops.append("ET")
    return "\n".join(ops)


def _n(v) -> str:
    return str(int(v)) if float(v).is_integer() else f"{v:.2f}"


def build_pdf(
    page_blocks: list,
    compress: bool = True,
    pad_to: int = 0,
    nested_tree: bool = False,
    split_contents_pages: frozenset = frozenset(),
    drop_eof: bool = False,
) -> bytes:
    """Serialize pages → one PDF byte string.

    ``page_blocks``: per page, a list of block strings (from text_block) or
    raw content-stream strings. ``split_contents_pages``: page indices whose
    blocks are split across TWO content-stream objects referenced as a
    /Contents array. ``nested_tree`` inserts an intermediate /Pages node
    (parsers must recurse, not read one /Kids level). ``pad_to`` pads the
    file to a minimum byte size with a comment line after the header.
    ``drop_eof`` emits a torn file without the %%EOF marker (for validator
    tests)."""
    objects: dict[int, bytes] = {}
    next_id = [1]

    def alloc() -> int:
        i = next_id[0]
        next_id[0] += 1
        return i

    def stream_obj(content) -> int:
        data = content if isinstance(content, bytes) else content.encode("utf-8")
        filt = ""
        if compress:
            data = zlib.compress(data)
            filt = " /Filter /FlateDecode"
        oid = alloc()
        objects[oid] = (
            f"<< /Length {len(data)}{filt} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )
        return oid

    catalog_id = alloc()
    root_pages_id = alloc()
    font_id = alloc()
    objects[font_id] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    def join_blocks(blocks) -> bytes:
        # blocks may be operator strings (text_block) or raw stream BYTES
        return b"\n".join(
            b if isinstance(b, bytes) else b.encode("utf-8") for b in blocks
        )

    page_ids = []
    kid_parent: dict[int, int] = {}
    for pno, blocks in enumerate(page_blocks):
        if pno in split_contents_pages and len(blocks) >= 2:
            half = len(blocks) // 2
            c1 = stream_obj(join_blocks(blocks[:half]))
            c2 = stream_obj(join_blocks(blocks[half:]))
            contents = f"[{c1} 0 R {c2} 0 R]"
        else:
            cid = stream_obj(join_blocks(blocks))
            contents = f"{cid} 0 R"
        pid = alloc()
        page_ids.append(pid)
        kid_parent[pid] = root_pages_id
        objects[pid] = (
            f"<< /Type /Page /Parent {{parent}} 0 R "
            f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] /Contents {contents} "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> >>"
        ).encode()  # parent patched below

    if nested_tree and len(page_ids) >= 2:
        # split kids across two intermediate /Pages nodes
        half = (len(page_ids) + 1) // 2
        mids = []
        for chunk in (page_ids[:half], page_ids[half:]):
            mid = alloc()
            mids.append(mid)
            kids = " ".join(f"{p} 0 R" for p in chunk)
            objects[mid] = (
                f"<< /Type /Pages /Parent {root_pages_id} 0 R "
                f"/Kids [{kids}] /Count {len(chunk)} >>"
            ).encode()
            for p in chunk:
                kid_parent[p] = mid
        kids_str = " ".join(f"{m} 0 R" for m in mids)
    else:
        kids_str = " ".join(f"{p} 0 R" for p in page_ids)

    for pid in page_ids:
        objects[pid] = objects[pid].replace(
            b"{parent}", str(kid_parent[pid]).encode()
        )

    objects[catalog_id] = f"<< /Type /Catalog /Pages {root_pages_id} 0 R >>".encode()
    objects[root_pages_id] = (
        f"<< /Type /Pages /Kids [{kids_str}] /Count {len(page_ids)} >>"
    ).encode()

    def serialize(pad: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        if pad > 0:
            out += b"%" + b"p" * pad + b"\n"
        offsets = {}
        for oid in sorted(objects):
            offsets[oid] = len(out)
            out += f"{oid} 0 obj\n".encode() + objects[oid] + b"\nendobj\n"
        xref_at = len(out)
        n = max(objects) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for oid in range(1, n):
            out += f"{offsets[oid]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {n} /Root {catalog_id} 0 R >>\n"
            f"startxref\n{xref_at}\n".encode()
        )
        if not drop_eof:
            out += b"%%EOF\n"
        return bytes(out)

    raw = serialize(0)
    if pad_to and len(raw) < pad_to:
        raw = serialize(pad_to - len(raw))
    return raw
