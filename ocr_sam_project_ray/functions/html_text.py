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
            if self._parts:  # guard: _flush call overhead dominates hot loop
                self._flush()
        elif tag in _CELL_TAGS:
            if self._in_row and self._row_has_cell:
                self._parts.append(" | ")
            self._row_has_cell = True
        elif tag == "a":
            self._link_depth += 1
        elif tag in _BLOCK_TAGS:
            if self._parts:
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
            if self._parts:
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


# ---------------------------------------------------------------------------
# Fast tokenizer path
# ---------------------------------------------------------------------------
#
# The block classifier never reads tag ATTRIBUTES, so a single compiled-regex
# tokenizer that skips attribute parsing entirely is ~2-3× faster than
# html.parser's state machine. The stdlib parser remains the REFERENCE
# implementation (``parse_paragraphs_stdlib``); equality of the two over the
# whole synthetic corpus and the handcrafted edge cases is asserted by
# tests/test_html_text.py. Raw-text elements (script/style/…) need no special
# casing here: they are in _SKIP_TAGS, and the handlers ignore every event
# while _skip_depth > 0, which reproduces html.parser's CDATA suppression for
# well-formed raw-text content.
#
# Set OCR_SAM_RAY_STDLIB_HTML=1 to force the stdlib parser at runtime.

_TOKEN = re.compile(
    r"<!--.*?-->"                       # comments
    r"|<!\[CDATA\[.*?\]\]>"             # CDATA blocks
    r"|<![^>]*>"                        # doctype / declarations
    r"|<\?[^>]*>"                       # processing instructions
    r"|</\s*>"                          # empty end tag (dropped, as stdlib)
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9-]*)"  # (1) closing? (2) tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"    # (3) attributes (ignored)
    r"(/?)\s*>",                            # (4) self-closing?
    re.DOTALL,
)

# Scope of fast/stdlib equivalence: byte-identical on well-formed HTML
# (asserted over every synthetic corpus page + edge cases + a hypothesis
# fuzz of generated well-formed documents). On PATHOLOGICAL markup
# (unterminated tags like "<p<", attribute quotes containing '>', stray
# '<' runs) the two parsers may segment differently — html.parser's own
# behavior there is recovery-heuristic, not spec. Both remain fully
# deterministic; OCR_SAM_RAY_STDLIB_HTML=1 selects the stdlib behavior.

import html as _html_mod
import os as _os

_FORCE_STDLIB = bool(_os.environ.get("OCR_SAM_RAY_STDLIB_HTML"))


def _fast_parse(html: str) -> list[Paragraph]:
    """Single-function tokenizer + block state machine (no per-event method
    dispatch). Bit-for-bit equivalent to _BlockParser on the corpus — the
    equality is asserted in tests over every synthetic page."""
    paragraphs: list[Paragraph] = []
    parts: list[str] = []
    link_parts: list[str] = []
    link_depth = 0
    skip_depth = 0
    in_row = False
    row_has_cell = False
    unescape = _html_mod.unescape

    def flush() -> None:
        nonlocal parts, link_parts
        # " ".join(s.split()) == _WS.sub(" ", s).strip() for every string:
        # str.split() and \s use the same Py_UNICODE_ISSPACE set (verified by
        # enumerating the codepoint space), and the C-level split is ~4×
        # faster than the regex sub. _BlockParser._flush keeps the sub form;
        # the stdlib-parity test pins the two equal over every corpus page.
        text = " ".join("".join(parts).split())
        joined_link = "".join(link_parts)  # usually empty — skip the split
        link_text = " ".join(joined_link.split()) if joined_link else ""
        parts = []
        link_parts = []
        if text:
            paragraphs.append(Paragraph(text, len(link_text)))

    pos = 0
    for m in _TOKEN.finditer(html):
        start = m.start()
        if start > pos and not skip_depth:
            text = html[pos:start]
            if "&" in text:
                text = unescape(text)
            parts.append(text)
            if link_depth:
                link_parts.append(text)
        pos = m.end()
        name = m.group(2)
        if name is None:
            continue  # comment / doctype / PI
        name = name.lower()
        if m.group(1):  # end tag
            if name in _SKIP_TAGS:
                if skip_depth:
                    skip_depth -= 1
                continue
            if skip_depth:
                continue
            if name == "a":
                if link_depth:
                    link_depth -= 1
            elif name in _BLOCK_TAGS:
                if parts:
                    flush()
                if name == "tr":
                    in_row = False
        else:  # start tag (html.parser maps self-closing to starttag too)
            if name in _SKIP_TAGS:
                skip_depth += 1
                continue
            if skip_depth:
                continue
            if name in _BREAK_TAGS:
                if parts:
                    flush()
            elif name in _CELL_TAGS:
                if in_row and row_has_cell:
                    parts.append(" | ")
                row_has_cell = True
            elif name == "a":
                link_depth += 1
            elif name in _BLOCK_TAGS:
                if parts:
                    flush()
                if name == "tr":
                    in_row = True
                    row_has_cell = False
    if pos < len(html) and not skip_depth:
        text = html[pos:]
        if "&" in text:
            text = unescape(text)
        parts.append(text)
        if link_depth:
            link_parts.append(text)
    if parts:
        flush()
    return paragraphs


def parse_paragraphs_stdlib(html: str) -> list[Paragraph]:
    """Reference implementation on html.parser (the parity baseline)."""
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    parser._flush()
    return parser.paragraphs


def parse_paragraphs(html: str) -> list[Paragraph]:
    if _FORCE_STDLIB:
        return parse_paragraphs_stdlib(html)
    return _fast_parse(html)


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
