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
