from ocr_sam_project_ray.functions.pdf_text import (
    extract_pdf_like_text, is_pdf_like,
)


def test_is_pdf_like():
    assert is_pdf_like(b"%PDF-1.4\nx")
    assert not is_pdf_like(b"<!DOCTYPE html>")
    assert not is_pdf_like(b"")


def test_layout_reading_order_recovered():
    # records scrambled; parser must sort by (y, x)
    payload = (
        b"%PDF-1.4\n"
        b"@30,5:tercera linea\n"
        b"@10,5:primera linea\n"
        b"@20,5:segunda linea\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "primera linea\nsegunda linea\ntercera linea"
    )


def test_same_y_sorts_by_x():
    payload = b"%PDF-1.4\n@10,50:derecha\n@10,2:izquierda\n%%EOF"
    assert extract_pdf_like_text(payload) == "izquierda\nderecha"


def test_multipage_form_feed():
    payload = (
        b"%PDF-1.4\n@10,1:pagina uno\x0c@10,1:pagina dos\n%%EOF"
    )
    assert extract_pdf_like_text(payload) == "pagina uno\npagina dos"


def test_garbage_records_ignored_and_padding_after_eof():
    payload = (
        b"%PDF-1.4\n@10,1:bueno\nno es registro\n@x,y:malo\n%%EOF\n%pppp"
    )
    assert extract_pdf_like_text(payload) == "bueno"


def test_empty_and_truncated():
    assert extract_pdf_like_text(b"") == ""
    assert extract_pdf_like_text(b"%PDF-1.4\n") == ""


# ---------------------------------------------------------------------------
# Adversarial layout goldens — every payload AND expectation below is
# HAND-AUTHORED (never produced by the generator or the parser), closing the
# golden-coupling caveat: a bug shared by compositor and extractor cannot
# hide here.
# ---------------------------------------------------------------------------

def test_two_column_page_reads_column_major():
    # naive global (y, x) sort would interleave: A1 B1 A2 B2 A3 B3
    payload = (
        b"%PDF-1.4\n"
        b"@80,410:B3\n"
        b"@60,55:A1\n"
        b"@70,420:B2\n"
        b"@80,60:A3\n"
        b"@60,415:B1\n"
        b"@70,50:A2\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == "A1\nA2\nA3\nB1\nB2\nB3"


def test_three_column_page():
    payload = (
        b"%PDF-1.4\n"
        b"@60,800:C1\n@70,810:C2\n"
        b"@60,400:B1\n@70,410:B2\n"
        b"@70,60:A2\n@60,50:A1\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == "A1\nA2\nB1\nB2\nC1\nC2"


def test_lone_margin_note_does_not_split_columns():
    # one far-right record is a margin note, not a column (MIN_COLUMN_RECORDS)
    # → single-column fallback: pure (y, x) order
    payload = (
        b"%PDF-1.4\n"
        b"@60,50:linea uno\n"
        b"@70,55:linea dos\n"
        b"@65,600:nota marginal\n"
        b"@80,52:linea tres\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "linea uno\nnota marginal\nlinea dos\nlinea tres"
    )


def test_repeated_header_footer_suppressed_across_pages():
    payload = (
        b"%PDF-1.4\n"
        b"@20,50:EXPEDIENTE 123 CONFIDENCIAL\n"
        b"@60,50:contenido uno\n"
        b"@1000000,50:pagina generada\n"
        b"\x0c"
        b"@20,60:EXPEDIENTE 123 CONFIDENCIAL\n"
        b"@60,50:contenido dos\n"
        b"@1000000,70:pagina generada\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == "contenido uno\ncontenido dos"


def test_single_page_header_is_kept():
    # no repetition evidence on a 1-page document → band content is real
    payload = (
        b"%PDF-1.4\n"
        b"@60,50:cuerpo del documento\n"
        b"@20,50:MEMBRETE DEL JUZGADO\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "MEMBRETE DEL JUZGADO\ncuerpo del documento"
    )


def test_distinct_band_texts_not_suppressed():
    # per-page page numbers differ → each (band, text) is on ONE page only
    payload = (
        b"%PDF-1.4\n"
        b"@1000000,50:pagina 1\n@60,50:uno\n"
        b"\x0c"
        b"@1000000,50:pagina 2\n@60,50:dos\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "uno\npagina 1\ndos\npagina 2"
    )


def test_fine_print_suppressed_by_size():
    payload = (
        b"%PDF-1.4\n"
        b"@60,50,s10:texto normal\n"
        b"@65,55,s5:BORRADOR\n"          # below MIN_SIZE=6 → dropped
        b"@70,50,s6:letra chica valida\n"  # boundary: exactly 6 → kept
        b"@80,50,s4:marca de agua\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "texto normal\nletra chica valida"
    )


def test_sizeless_records_default_to_size_10():
    payload = b"%PDF-1.4\n@60,50:compat v1\n@70,50,s12:titular\n%%EOF"
    assert extract_pdf_like_text(payload) == "compat v1\ntitular"


def test_render_parse_inverse_property_many_seeds():
    """For ANY composed document, rendering through the corpus fixture
    writer and parsing back must be the identity — 200 seeded cases
    covering every renderer feature combination (page splits, two-column
    layout, repeated headers/footers, watermarks)."""
    import random

    from ocr_sam_project_ray.sources.synthetic import _render_pdf_like

    for seed in range(200):
        rng = random.Random(f"roundtrip:{seed}")
        n = rng.randrange(1, 40)
        lines = [f"linea {i} del documento s{seed}" for i in range(n)]
        raw = _render_pdf_like(rng, lines)
        assert extract_pdf_like_text(raw) == "\n".join(lines), seed


def test_kitchen_sink_document():
    """Two pages: page 1 two-column with a watermark, page 2 single-column;
    repeated header on both pages; hand-computed expectation."""
    payload = (
        b"%PDF-1.4\n"
        b"@20,50:JUZGADO SEGUNDO - OFICIOS\n"
        b"@70,420:derecha dos\n"
        b"@60,50:izquierda uno\n"
        b"@300,60,s4:COPIA NO OFICIAL\n"
        b"@60,410:derecha una\n"
        b"@70,60:izquierda dos\n"
        b"\x0c"
        b"@20,70:JUZGADO SEGUNDO - OFICIOS\n"
        b"@70,50:fin del documento\n"
        b"@60,50:continuacion\n"
        b"%%EOF"
    )
    assert extract_pdf_like_text(payload) == (
        "izquierda uno\nizquierda dos\nderecha una\nderecha dos\n"
        "continuacion\nfin del documento"
    )
