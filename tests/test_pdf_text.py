"""Real-PDF extractor tests.

Every adversarial-layout payload below is HAND-AUTHORED — raw PDF objects
and content-stream operators written literally in the test (uncompressed
streams for readability), with the expectation hand-computed. Neither the
corpus generator nor functions/pdf_build.py is consulted, so a bug shared
by compositor and extractor cannot hide here. The final property test is
the only one that goes through the generator's renderer.

Geometry reminders (see functions/pdf_text.py): page height 792, y-axis UP;
header band y ≥ 742, footer band y ≤ 92, fine print = font size < 6,
columns split at x gaps ≥ 100.
"""

import zlib

from ocr_sam_project_ray.functions.pdf_text import (
    extract_pdf_like_text, is_pdf_like,
)


def _pdf(streams, drop_eof=False, compress=False):
    """Wrap per-page content streams (bytes) in a minimal hand-authored PDF
    object skeleton: catalog → pages → page+stream per page + trailer."""
    bodies = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids = []
    oid = 3
    for s in streams:
        if compress:
            s = zlib.compress(s)
        cid, pid = oid, oid + 1
        oid += 2
        filt = b" /Filter /FlateDecode" if compress else b""
        bodies[cid] = (
            b"<< /Length %d%s >>\nstream\n" % (len(s), filt) + s + b"\nendstream"
        )
        bodies[pid] = b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % cid
        kids.append(pid)
    bodies[2] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % len(streams)
    )
    out = b"%PDF-1.4\n"
    for i in sorted(bodies):
        out += b"%d 0 obj\n" % i + bodies[i] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n"
    if not drop_eof:
        out += b"%%EOF\n"
    return out


def _line(x, y, text, size=10):
    return b"BT /F1 %d Tf 1 0 0 1 %d %d Tm (%s) Tj ET" % (
        size, x, y, text,
    )


def test_is_pdf_like():
    assert is_pdf_like(b"%PDF-1.4\nx")
    assert not is_pdf_like(b"<!DOCTYPE html>")
    assert not is_pdf_like(b"")


def test_layout_reading_order_recovered():
    # blocks scrambled in the stream; parser must sort by (y_down, x)
    stream = b"\n".join([
        _line(50, 696, b"tercera linea"),
        _line(50, 720, b"primera linea"),
        _line(50, 708, b"segunda linea"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == (
        "primera linea\nsegunda linea\ntercera linea"
    )


def test_same_y_sorts_by_x():
    stream = b"\n".join([
        _line(90, 720, b"derecha"),
        _line(50, 720, b"izquierda"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == "izquierda\nderecha"


def test_multipage_reads_in_page_tree_order():
    p1 = _line(50, 720, b"pagina uno")
    p2 = _line(50, 720, b"pagina dos")
    assert extract_pdf_like_text(_pdf([p1, p2])) == "pagina uno\npagina dos"


def test_unknown_operators_ignored_and_padding_after_eof():
    # q/Q/re/f graphics ops and a comment are not text; junk after %%EOF ok
    stream = (
        b"q 1 0 0 1 0 0 cm\n50 50 100 100 re f\nQ\n% comentario\n"
        + _line(50, 720, b"bueno")
    )
    payload = _pdf([stream]) + b"%pppp"
    assert extract_pdf_like_text(payload) == "bueno"


def test_empty_truncated_and_junk():
    assert extract_pdf_like_text(b"") == ""
    assert extract_pdf_like_text(b"%PDF-1.4\n") == ""
    assert extract_pdf_like_text(b"%PDF-1.4\ngarbage without objects\n%%EOF") == ""


def test_torn_file_without_eof_still_parses_structurally():
    # the VALIDATOR rejects it upstream (missing-EOF parity with
    # validators.py:39); the extractor itself is tolerant — object scan
    # does not need the trailer marker
    payload = _pdf([_line(50, 720, b"contenido")], drop_eof=True)
    assert extract_pdf_like_text(payload) == "contenido"


# ---------------------------------------------------------------------------
# operator coverage (hand-authored streams)
# ---------------------------------------------------------------------------

def test_td_tstar_quote_relative_motion():
    stream = (
        b"BT /F1 10 Tf 14 TL\n"
        b"1 0 0 1 50 720 Tm\n"
        b"(uno) Tj\n"
        b"0 -14 Td\n"
        b"(dos) Tj\n"
        b"T*\n"
        b"(tres) Tj\n"
        b"(cuatro) '\n"
        b"ET"
    )
    assert extract_pdf_like_text(_pdf([stream])) == "uno\ndos\ntres\ncuatro"


def test_TD_sets_leading_for_following_tstar():
    stream = (
        b"BT /F1 10 Tf\n"
        b"1 0 0 1 50 720 Tm\n"
        b"(a) Tj\n"
        b"0 -20 TD\n"      # move AND set leading to 20
        b"(b) Tj\n"
        b"T*\n"             # uses leading 20 → y 680
        b"(c) Tj\n"
        b"ET"
    )
    assert extract_pdf_like_text(_pdf([stream])) == "a\nb\nc"


def test_tj_array_concatenates_pieces_ignoring_kerning():
    stream = (
        b"BT /F1 10 Tf 1 0 0 1 50 720 Tm\n"
        b"[(Provincia ) -120 (de ) 15 (Panama)] TJ\n"
        b"ET"
    )
    assert extract_pdf_like_text(_pdf([stream])) == "Provincia de Panama"


def test_hex_strings_and_escapes_and_octal():
    # hex 'caf\xc3\xa9' = café; literal with \( \) \\ and octal \101 = A
    stream = (
        b"BT /F1 10 Tf 1 0 0 1 50 720 Tm\n"
        b"<63616665cc81> Tj\n"  # 'cafe' + combining acute (raw utf-8 hex)
        b"1 0 0 1 50 708 Tm\n"
        b"(par\\(en\\)tesis \\\\ y \\101) Tj\n"
        b"ET"
    )
    got = extract_pdf_like_text(_pdf([stream]))
    assert got == "café\npar(en)tesis \\ y A"


def test_contents_array_concatenates_streams():
    s1 = _line(50, 720, b"primera")
    s2 = _line(50, 708, b"segunda")
    payload = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [3 0 R 4 0 R] >>\n"
        b"endobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%%%EOF\n"
    ) % (len(s1), s1, len(s2), s2)
    assert extract_pdf_like_text(payload) == "primera\nsegunda"


def test_nested_pages_tree_walk():
    s1 = _line(50, 720, b"uno")
    s2 = _line(50, 720, b"dos")
    s3 = _line(50, 720, b"tres")
    payload = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [6 0 R 7 0 R] /Count 3 >>\nendobj\n"
        b"3 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"6 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [8 0 R 9 0 R] /Count 2 >>\nendobj\n"
        b"7 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [10 0 R] /Count 1 >>\nendobj\n"
        b"8 0 obj\n<< /Type /Page /Parent 6 0 R /Contents 3 0 R >>\nendobj\n"
        b"9 0 obj\n<< /Type /Page /Parent 6 0 R /Contents 4 0 R >>\nendobj\n"
        b"10 0 obj\n<< /Type /Page /Parent 7 0 R /Contents 5 0 R >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%%%EOF\n"
    ) % (len(s1), s1, len(s2), s2, len(s3), s3)
    assert extract_pdf_like_text(payload) == "uno\ndos\ntres"


def test_flatedecode_stream():
    stream = b"\n".join([
        _line(50, 720, b"comprimido uno"),
        _line(50, 708, b"comprimido dos"),
    ])
    assert extract_pdf_like_text(_pdf([stream], compress=True)) == (
        "comprimido uno\ncomprimido dos"
    )


def test_binary_stream_with_fake_markers_does_not_derail_scan():
    """Compressed bytes may contain 'obj'/'endobj'/'stream' byte patterns;
    the /Length-driven scan must jump over them exactly."""
    evil = b"x 7 0 obj endobj stream endstream " + b"\x00\x01" * 8
    payload = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%%%EOF\n"
    ) % (len(evil), evil, len(_line(50, 720, b"limpio")), _line(50, 720, b"limpio"))
    assert extract_pdf_like_text(payload) == "limpio"


# ---------------------------------------------------------------------------
# layout analysis over real coordinates
# ---------------------------------------------------------------------------

def test_two_column_page_reads_column_major():
    # naive global (y_down, x) sort would interleave: A1 B1 A2 B2 A3 B3
    stream = b"\n".join([
        _line(410, 696, b"B3"),
        _line(55, 720, b"A1"),
        _line(420, 708, b"B2"),
        _line(60, 696, b"A3"),
        _line(415, 720, b"B1"),
        _line(50, 708, b"A2"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == "A1\nA2\nA3\nB1\nB2\nB3"


def test_three_column_page():
    stream = b"\n".join([
        _line(560, 720, b"C1"),
        _line(565, 708, b"C2"),
        _line(400, 720, b"B1"),
        _line(410, 708, b"B2"),
        _line(60, 708, b"A2"),
        _line(50, 720, b"A1"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == "A1\nA2\nB1\nB2\nC1\nC2"


def test_lone_margin_note_does_not_split_columns():
    # one far-right record is a margin note, not a column → single-column
    # fallback: pure (y_down, x) order
    stream = b"\n".join([
        _line(50, 720, b"linea uno"),
        _line(55, 708, b"linea dos"),
        _line(600, 714, b"nota marginal"),
        _line(52, 696, b"linea tres"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == (
        "linea uno\nnota marginal\nlinea dos\nlinea tres"
    )


def test_repeated_header_footer_suppressed_across_pages():
    p1 = b"\n".join([
        _line(50, 770, b"EXPEDIENTE 123 CONFIDENCIAL"),
        _line(50, 720, b"contenido uno"),
        _line(50, 30, b"pagina generada"),
    ])
    p2 = b"\n".join([
        _line(60, 770, b"EXPEDIENTE 123 CONFIDENCIAL"),
        _line(50, 720, b"contenido dos"),
        _line(70, 30, b"pagina generada"),
    ])
    assert extract_pdf_like_text(_pdf([p1, p2])) == (
        "contenido uno\ncontenido dos"
    )


def test_single_page_header_is_kept():
    # no repetition evidence on a 1-page document → band content is real
    stream = b"\n".join([
        _line(50, 720, b"cuerpo del documento"),
        _line(50, 770, b"MEMBRETE DEL JUZGADO"),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == (
        "MEMBRETE DEL JUZGADO\ncuerpo del documento"
    )


def test_distinct_band_texts_not_suppressed():
    # per-page page numbers differ → each (band, text) is on ONE page only
    p1 = b"\n".join([_line(50, 30, b"pagina 1"), _line(50, 720, b"uno")])
    p2 = b"\n".join([_line(50, 30, b"pagina 2"), _line(50, 720, b"dos")])
    assert extract_pdf_like_text(_pdf([p1, p2])) == (
        "uno\npagina 1\ndos\npagina 2"
    )


def test_fine_print_suppressed_by_size():
    stream = b"\n".join([
        _line(50, 720, b"texto normal", size=10),
        _line(55, 708, b"BORRADOR", size=5),           # < MIN_SIZE → dropped
        _line(50, 696, b"letra chica valida", size=6),  # boundary: kept
        _line(50, 684, b"marca de agua", size=4),
    ])
    assert extract_pdf_like_text(_pdf([stream])) == (
        "texto normal\nletra chica valida"
    )


def test_no_tf_defaults_to_size_10():
    stream = b"1 0 0 1 50 720 Tm (sin fuente) Tj"
    wrapped = b"BT\n" + stream + b"\nET"
    assert extract_pdf_like_text(_pdf([wrapped])) == "sin fuente"


def test_kitchen_sink_document():
    """Two pages: page 1 two-column with a watermark, page 2 single-column;
    repeated header on both pages; hand-computed expectation."""
    p1 = b"\n".join([
        _line(50, 770, b"JUZGADO SEGUNDO - OFICIOS"),
        _line(420, 708, b"derecha dos"),
        _line(50, 720, b"izquierda uno"),
        _line(60, 500, b"COPIA NO OFICIAL", size=4),
        _line(410, 720, b"derecha una"),
        _line(60, 708, b"izquierda dos"),
    ])
    p2 = b"\n".join([
        _line(70, 770, b"JUZGADO SEGUNDO - OFICIOS"),
        _line(50, 708, b"fin del documento"),
        _line(50, 720, b"continuacion"),
    ])
    assert extract_pdf_like_text(_pdf([p1, p2])) == (
        "izquierda uno\nizquierda dos\nderecha una\nderecha dos\n"
        "continuacion\nfin del documento"
    )


def test_render_parse_inverse_property_many_seeds():
    """For ANY composed document, rendering through the corpus's REAL-PDF
    writer and parsing back must be the identity — 200 seeded cases
    covering every renderer feature combination (pagination, two-column
    layout, repeated headers/footers, watermarks, TJ/hex/quote styles,
    /Contents arrays, nested page trees, FlateDecode)."""
    import random

    from ocr_sam_project_ray.sources.synthetic import _render_pdf_like

    for seed in range(200):
        rng = random.Random(f"roundtrip:{seed}")
        n = rng.randrange(1, 120)
        lines = [f"linea {i} del documento s{seed}" for i in range(n)]
        raw = _render_pdf_like(rng, lines)
        assert raw.startswith(b"%PDF-") and b"%%EOF" in raw
        assert extract_pdf_like_text(raw) == "\n".join(lines), seed


def test_fast_tokenizer_matches_reference():
    """The compiled-scanner tokenizer must be token-for-token equal to the
    character-walk reference over every content stream the corpus writer
    emits, plus handcrafted edge cases."""
    import random
    import zlib

    from ocr_sam_project_ray.functions.pdf_text import (
        _content_refs, _page_order, _scan_objects, _stream_bytes,
        _tokens, _tokens_reference,
    )
    from ocr_sam_project_ray.sources.synthetic import _render_pdf_like

    def streams_of(raw):
        objects = _scan_objects(raw)
        import re
        root = None
        for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", raw):
            root = int(m.group(1))
        for pid in _page_order(objects, root):
            for c in _content_refs(objects[pid]):
                if c in objects:
                    yield _stream_bytes(objects[c])

    n_streams = 0
    for seed in range(40):
        rng = random.Random(f"tokeq:{seed}")
        lines = [f"linea (con) par\\entesis {i}" for i in range(rng.randrange(1, 60))]
        raw = _render_pdf_like(rng, lines)
        for data in streams_of(raw):
            assert list(_tokens(data)) == list(_tokens_reference(data))
            n_streams += 1
    assert n_streams > 40

    cases = [
        b"",
        b"BT (hola) Tj ET",
        b"(a\\(b\\)c) Tj (a(nested)b) Tj",           # nested unescaped parens
        b"[(x) -20 (y)] TJ <48 6f 6c61> Tj",
        b"(oct \\101\\102) Tj (tab\\t) Tj (bs\\\\) '",
        b"1 0 0 1 50 720 Tm /F1 10 Tf 12 TL T* T*",
        b"% comment line\n(z) Tj",
        b"<< /X 1 >> (dict) Tj",
        b"(unterminated",
        b"-1.5 .5 +3. 007 Td",
    ]
    for data in cases:
        assert list(_tokens(data)) == list(_tokens_reference(data)), data


def test_fused_interpreter_matches_reference():
    """The fused scanner+interpreter must produce record-for-record the
    same output as the tokenizer-driven reference over corpus streams and
    edge cases (incl. the nested-literal fallback)."""
    import random
    import zlib

    from ocr_sam_project_ray.functions.pdf_text import (
        _content_refs, _page_order, _scan_objects, _stream_bytes,
        _interpret, _interpret_via_tokens,
    )
    from ocr_sam_project_ray.sources.synthetic import _render_pdf_like
    import re

    n = 0
    for seed in range(30):
        rng = random.Random(f"inteq:{seed}")
        lines = [f"linea (x\\y) {i}" for i in range(rng.randrange(1, 50))]
        raw = _render_pdf_like(rng, lines)
        objects = _scan_objects(raw)
        root = None
        for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", raw):
            root = int(m.group(1))
        for pid in _page_order(objects, root):
            for c in _content_refs(objects[pid]):
                data = _stream_bytes(objects[c])
                assert _interpret(data) == _interpret_via_tokens(data)
                n += 1
    assert n > 30
    cases = [
        b"BT 1 0 0 1 50 700 Tm /F1 10 Tf (a(nested)b) Tj ET",
        b"BT 12 TL 1 0 0 1 50 700 Tm (x) Tj (y) ' [(p) -9 (q)] TJ ET",
        b"BT <4869> Tj ET",
        b"(unterminated",
        b"garbage { } >> << stream endstream BT (ok) Tj ET",
    ]
    for data in cases:
        assert _interpret(data) == _interpret_via_tokens(data), data
