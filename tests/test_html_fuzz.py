"""Property test: fast tokenizer ≡ stdlib reference on WELL-FORMED HTML.

Hypothesis generates random balanced documents (nested blocks, links,
tables, entities, comments, scripts, varied whitespace/case); any
divergence between the two parsers is a bug. Pathological markup is out of
scope (documented in html_text.py)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_sam_project_ray.functions.html_text import (
    classify_paragraphs, parse_paragraphs, parse_paragraphs_stdlib,
)

WORDS = ["hola", "texto", "contenido", "principal", "b&amp;b", "café",
         "2-345-6789", "B/. 1,500.00", "&#65;", "x y  z"]

text_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join)


@st.composite
def element(draw, depth=0):
    if depth >= 3:
        return draw(text_st)
    kind = draw(st.integers(0, 7))
    inner = " ".join(draw(st.lists(element(depth + 1), min_size=0, max_size=3)))
    if kind == 0:
        return f"<p>{inner}</p>"
    if kind == 1:
        return f"<div>{inner}</div>"
    if kind == 2:
        return f'<a href="/x">{draw(text_st)}</a>'
    if kind == 3:
        cells = "".join(f"<td>{draw(text_st)}</td>" for _ in range(draw(st.integers(1, 3))))
        return f"<table><tr>{cells}</tr></table>"
    if kind == 4:
        return f"<!-- {draw(text_st)} -->"
    if kind == 5:
        return f"<script>var x = '{draw(text_st)}';</script>"
    if kind == 6:
        return f"<br/>{draw(text_st)}"
    return draw(text_st)


doc_st = st.lists(element(), min_size=0, max_size=6).map(
    lambda parts: "<!DOCTYPE html><html><head><title>t</title></head><body>"
    + "".join(parts)
    + "</body></html>"
)


def _text_of(paras):
    classify_paragraphs(paras)
    return "\n".join(p.text for p in paras if p.label == "good")


@settings(max_examples=300, deadline=None)
@given(doc_st)
def test_fast_equals_stdlib_on_wellformed(doc):
    assert _text_of(parse_paragraphs(doc)) == _text_of(parse_paragraphs_stdlib(doc))
