"""HTML main-content extraction: block segmentation + text-density /
link-density boilerplate classification (Readability / Boilerpipe / jusText
family of heuristics, implemented fresh on the stdlib ``html.parser`` so the
output bytes are fully deterministic and independent of third-party parser
versions — see SURVEY.md §7 "Hard parts" (a)).

Role parity: this is the engine's analog of the reference's page-text
extraction + separator/config page filtering
(/root/reference/src/services/pdf_service.py:69-104, 209-223) and of the
remote-OCR text recovery (src/services/ocr_service.py:504-661) — the stage
that turns an opaque payload into the canonical ``extracted_text`` whose
bytes are the per-url correctness contract.

Classification rule (deterministic, documented here as THE contract):
  * a paragraph with no visible characters is BAD
  * link_density = link_chars / chars; link_density > 0.30 → BAD
  * chars >= 40 and link_density <= 0.10 → GOOD
  * otherwise NEAR; NEAR paragraphs adjacent to a GOOD paragraph are
    promoted to GOOD (fixpoint propagation in both directions) — this keeps
    short headings, config lines, separator markers and table rows that sit
    inside real content, while isolated short/linky blocks are dropped.
``extracted_text`` = "\n".join(GOOD paragraph texts), each paragraph
whitespace-collapsed and stripped; table rows render cells joined by " | "
(matching the person-row format the span extractor consumes,
post_ocr_validator.py:108).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"\s+")

# Tags whose subtree is invisible
_SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg", "iframe"}

# Tags that open/close a paragraph boundary
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "tr", "div", "table",
    "ul", "ol", "blockquote", "pre", "section", "article", "header",
    "footer", "nav", "aside", "main", "form", "dd", "dt", "figure",
    "figcaption", "caption", "address", "fieldset",
}

# Void tags that force a paragraph break
_BREAK_TAGS = {"br", "hr"}

# Cell tags inside a table row — joined with " | "
_CELL_TAGS = {"td", "th"}

LINK_DENSITY_BAD = 0.30
LINK_DENSITY_GOOD = 0.10
GOOD_MIN_CHARS = 40


class Paragraph:
    __slots__ = ("text", "chars", "link_chars", "label")

    def __init__(self, text: str, link_chars: int):
        self.text = text
        self.chars = len(text)
        self.link_chars = link_chars
        self.label = "near"


class _BlockParser(HTMLParser):
    """Streams HTML into a flat list of Paragraph records."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[Paragraph] = []
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._link_depth = 0
        self._skip_depth = 0
        self._in_row = False
        self._row_has_cell = False

    # -- flush ---------------------------------------------------------
    def _flush(self) -> None:
        if not self._parts:
            self._link_parts.clear()
            return
        text = _WS.sub(" ", "".join(self._parts)).strip()
        link_text = _WS.sub(" ", "".join(self._link_parts)).strip()
        self._parts.clear()
        self._link_parts.clear()
        if text:
            self.paragraphs.append(Paragraph(text, len(link_text)))

    # -- handlers ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in _BREAK_TAGS:
            self._flush()
        elif tag in _CELL_TAGS:
            if self._in_row and self._row_has_cell:
                self._parts.append(" | ")
            self._row_has_cell = True
        elif tag == "a":
            self._link_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
            if tag == "tr":
                self._in_row = True
                self._row_has_cell = False

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
            if tag == "tr":
                self._in_row = False

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_parts.append(data)


def parse_paragraphs(html: str) -> list[Paragraph]:
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    parser._flush()
    return parser.paragraphs


def classify_paragraphs(paragraphs: list[Paragraph]) -> None:
    """In-place GOOD/BAD/NEAR labeling + fixpoint NEAR→GOOD propagation."""
    for p in paragraphs:
        if p.chars == 0:
            p.label = "bad"
            continue
        density = p.link_chars / p.chars
        if density > LINK_DENSITY_BAD:
            p.label = "bad"
        elif p.chars >= GOOD_MIN_CHARS and density <= LINK_DENSITY_GOOD:
            p.label = "good"
        else:
            p.label = "near"

    changed = True
    while changed:
        changed = False
        for i, p in enumerate(paragraphs):
            if p.label != "near":
                continue
            prev_good = i > 0 and paragraphs[i - 1].label == "good"
            next_good = i + 1 < len(paragraphs) and paragraphs[i + 1].label == "good"
            if prev_good or next_good:
                p.label = "good"
                changed = True


def extract_main_text(html_bytes: bytes) -> str:
    """payload bytes → canonical extracted text (the byte-identical contract).

    Non-UTF-8 byte sequences decode with U+FFFD replacement (deterministic).
    """
    if not html_bytes:
        return ""
    html = html_bytes.decode("utf-8", errors="replace")
    paragraphs = parse_paragraphs(html)
    classify_paragraphs(paragraphs)
    return "\n".join(p.text for p in paragraphs if p.label == "good")
