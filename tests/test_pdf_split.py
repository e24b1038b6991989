"""Binary PDF page split + reassembly (functions/pdf_split.py,
stages/pdf_split.py) — page-level twin of the text splitter, over REAL
PDF bytes."""

import pytest

from ocr_sam_project_ray.functions.pdf_build import build_pdf, text_block
from ocr_sam_project_ray.functions.pdf_split import (
    is_separator_page,
    pdf_page_texts,
    reassemble_pdf,
    split_page_ranges,
    split_pdf,
)
from ocr_sam_project_ray.functions.pdf_text import extract_pdf_like_text


def _page(lines, y0=720, size=10):
    return [text_block(60, y0 - 12 * i, size, [ln])
            for i, ln in enumerate(lines)]


def _sep_page():
    return _page(["--- SEPARADOR DE OFICIOS ---"])


def _config_page():
    return _page(["CANTIDAD_OFICIOS: 2", "EMPRESA: ACME", "LOTE: 7"])


def test_page_texts_reading_order():
    pdf = build_pdf([_page(["uno", "dos"]), _page(["tres"])])
    assert pdf_page_texts(pdf) == ["uno\ndos", "tres"]


def test_separator_page_classification():
    assert is_separator_page("--- SEPARADOR DE OFICIOS ---")
    assert not is_separator_page("parrafo normal de texto corrido")
    # long pages with a separator-looking line are NOT separator pages
    many = "\n".join(["linea"] * 6 + ["--- SEPARADOR DE OFICIOS ---"])
    assert not is_separator_page(many)
    assert not is_separator_page("")


def test_split_ranges_basic_and_tail():
    texts = ["a", "--- SEPARADOR DE OFICIOS ---", "b", "c",
             "--- SEPARADOR DE OFICIOS ---", "d"]
    assert split_page_ranges(texts) == [(0, 1), (2, 4), (5, 6)]


def test_split_ranges_config_page_skipped():
    texts = ["CANTIDAD_OFICIOS: 2\nEMPRESA: X", "a",
             "--- SEPARADOR DE OFICIOS ---", "b"]
    assert split_page_ranges(texts) == [(1, 2), (3, 4)]


def test_split_ranges_no_separator_whole_doc():
    assert split_page_ranges(["a", "b"]) == [(0, 2)]
    assert split_page_ranges([]) == []


def test_reassembled_parts_are_valid_pdfs_with_same_text():
    src = build_pdf(
        [
            _page(["oficio uno, pagina uno", "texto del cuerpo"]),
            _page(["oficio uno, pagina dos"]),
            _sep_page(),
            _page(["oficio dos, pagina unica"]),
        ],
        compress=True,
    )
    parts = split_pdf(src)
    assert len(parts) == 2
    for p in parts:
        assert p.startswith(b"%PDF-") and p.rstrip().endswith(b"%%EOF")
    assert extract_pdf_like_text(parts[0]) == (
        "oficio uno, pagina uno\ntexto del cuerpo\noficio uno, pagina dos"
    )
    assert extract_pdf_like_text(parts[1]) == "oficio dos, pagina unica"


def test_split_with_config_page_and_contents_array():
    src = build_pdf(
        [
            _config_page(),
            _page(["primer oficio"] * 4),
            _sep_page(),
            _page(["segundo oficio"] * 3),
        ],
        compress=True,
        split_contents_pages=frozenset({1}),
    )
    parts = split_pdf(src)
    assert len(parts) == 2
    assert extract_pdf_like_text(parts[0]) == "\n".join(["primer oficio"] * 4)
    assert extract_pdf_like_text(parts[1]) == "\n".join(["segundo oficio"] * 3)


def test_split_hostile_inputs():
    assert split_pdf(b"") == []
    assert split_pdf(b"<html>no pdf</html>") == []
    assert split_pdf(b"%PDF-1.4\ngarbage no objects") == []


def test_part_reassembly_preserves_page_count():
    pages = [_page([f"pagina {i}"]) for i in range(5)]
    src = build_pdf(pages, nested_tree=True)
    part = reassemble_pdf(src, (1, 4))
    assert pdf_page_texts(part) == ["pagina 1", "pagina 2", "pagina 3"]


def test_split_stage_over_dataset(ray_session):
    import ray.data

    from ocr_sam_project_ray.stages.pdf_split import split_pdf_documents

    src = build_pdf(
        [_page(["oficio A"]), _sep_page(), _page(["oficio B"])]
    )
    single = build_pdf([_page(["solo"])])
    rows = [
        {"url": "u1", "html": src},
        {"url": "u2", "html": single},
        {"url": "u3", "html": b"<html>paso html</html>"},
    ]
    out = split_pdf_documents(ray.data.from_items(rows)).to_pandas()
    out = out.sort_values(["url", "part_index"]).reset_index(drop=True)
    assert list(out.part_id) == ["u1#part001", "u1#part002", "u2"]
    assert list(out.n_parts) == [2, 2, 1]
    assert list(out.n_pages) == [1, 1, 1]
    texts = [extract_pdf_like_text(p) for p in out.payload]
    assert texts == ["oficio A", "oficio B", "solo"]
