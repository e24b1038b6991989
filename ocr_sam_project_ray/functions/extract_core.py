"""Document-level extraction core: metadata parsing, segment splitting,
span/entity annotation, classification, validation and confidence scoring.

Pure deterministic functions over the canonical ``extracted_text`` — no Ray,
no I/O. Behavioral parity targets in /root/reference:

- metadata parse + defaults: src/services/metadata_service.py:49-123
- separator split incl. tail segment: src/services/pdf_service.py:106-147
- segment id minting ``{url}#seg{n:03d}``: analog of
  ``{batch_id}_oficio_{n:03d}`` at src/services/pdf_service.py:196
- count validation, tolerance max(1, 10%): src/shared/validators.py:46-91
- person fallback extraction: src/services/post_ocr_validator.py:98-135
- basic info fallback: src/ocr_processor/app.py:547-582
- Panamanian pattern validation + score + 0.7 gate:
  src/services/ocr_service.py:726-827
- confidence derivation: src/services/ocr_service.py:620-638
- monto_total: src/ocr_processor/app.py:403
"""

from __future__ import annotations

import re
from typing import Any, Optional

from . import patterns as P
from .classify import classify_text, matched_keywords
from .textops import parse_monto


# ---------------------------------------------------------------------------
# Metadata (config block)
# ---------------------------------------------------------------------------

def parse_metadata(text: str) -> dict[str, Any]:
    """Parse the leading config block of a document's extracted text.

    Mirrors metadata_service.py:49-123: lowercase the text, try each
    field's alternative patterns in order, first hit wins; count extracted
    fields; fall back to defaults. (Line structure is preserved — see the
    divergence note in ``patterns.py``.)
    """
    normalized = (text or "").lower()
    meta: dict[str, Any] = dict(P.METADATA_DEFAULTS)
    extracted = 0
    for field, pats in P.METADATA_PATTERNS.items():
        for pat in pats:
            m = pat.search(normalized)
            if m:
                value = m.group(1).strip()
                if field == "cantidad_oficios":
                    try:
                        meta["cantidad_oficios_declarada"] = int(value)
                        extracted += 1
                    except ValueError:
                        continue
                elif field == "fecha":
                    meta["fecha_envio"] = value
                    extracted += 1
                else:
                    meta[field] = value
                    extracted += 1
                break
    meta["extraction_success"] = extracted > 0
    meta["extracted_fields_count"] = extracted
    return meta


def parse_metadata_has_config(text: str) -> bool:
    """Config-block detection scoped to the document's FIRST line — the line
    analog of the reference's first-page check (pdf_service.py:209-223)."""
    first_line = (text or "").split("\n", 1)[0]
    return P.has_config_block(first_line)


def validate_metadata(meta: dict[str, Any]) -> tuple[bool, str, str]:
    """(valid, error, warning) — mirrors validators.py:93-134."""
    missing = [
        f for f in ("empresa", "cantidad_oficios_declarada")
        if f not in meta or not meta[f]
    ]
    warnings: list[str] = []
    count = meta.get("cantidad_oficios_declarada")
    if count is not None and (count < 0 or count > 1000):
        warnings.append(f"Cantidad de oficios inusual: {count}")
    if meta.get("empresa") and len(str(meta["empresa"])) < 3:
        warnings.append("Nombre de empresa muy corto")
    if missing:
        return False, f"Campos requeridos faltantes: {missing}", "; ".join(warnings)
    return True, "", "; ".join(warnings)


# ---------------------------------------------------------------------------
# Segment splitting (the document splitter)
# ---------------------------------------------------------------------------

def split_segments(text: str) -> list[str]:
    """Split extracted text at separator lines into sub-document segments.

    Line-level analog of the page-level split at pdf_service.py:106-147:
    for each separator, the segment is the run of lines since the previous
    separator (or the start); a non-empty tail after the last separator is
    emitted too. With no separators the whole document is one segment
    (divergence note: the reference's no-separator fallback splits per page
    with ``oficios_per_page`` (pdf_service.py:149-177); a per-line analog
    would shred documents, so the engine keeps them whole and lets count
    validation flag the mismatch).
    """
    if not text:
        return []
    # One whole-document lower() + four C-level probes reject separator-free
    # docs without a per-line scan; when a probe hits, the lowered lines are
    # reused so no line pays a second lower(). lower() never introduces a
    # newline, so ``low.split`` aligns 1:1 with ``text.split`` (the only
    # cross-line lower() context rule, Greek final-sigma, maps within the
    # σ/ς pair — disjoint from every probe, so per-doc and per-line lowering
    # probe identically).
    low = text.lower()
    if not any(p in low for p in P.SEPARATOR_PROBES):
        return [text]
    lines = text.split("\n")
    low_lines = low.split("\n")
    sep_idx = [
        i
        for i, ln in enumerate(lines)
        if P.is_separator_line(ln, low_lines[i])
    ]
    if not sep_idx:
        return [text]
    segments: list[str] = []
    for i, sep in enumerate(sep_idx):
        start = 0 if i == 0 else sep_idx[i - 1] + 1
        if sep > start:
            segments.append("\n".join(lines[start:sep]))
    if sep_idx[-1] + 1 < len(lines):
        tail = "\n".join(lines[sep_idx[-1] + 1:])
        if tail:
            segments.append(tail)
    return segments


def mint_doc_id(url: str, seg_index: int, n_segments: int) -> str:
    """``url`` for single-segment docs, else ``url#seg{n:03d}`` (1-based) —
    analog of pdf_service.py:196."""
    if n_segments <= 1:
        return url
    return f"{url}#seg{seg_index + 1:03d}"


def validate_count(extracted: int, declared: int) -> tuple[bool, str, str]:
    """(valid, error, warning) — mirrors validators.py:46-91."""
    if extracted == 0:
        return False, "No se pudieron extraer oficios del PDF", ""
    if declared == 0:
        return True, "", (
            f"No se declaró cantidad, procesando {extracted} oficios encontrados"
        )
    if extracted == declared:
        return True, "", ""
    tolerance = max(1, int(declared * 0.1))
    difference = abs(extracted - declared)
    if difference <= tolerance:
        return True, "", (
            f"Diferencia menor dentro de tolerancia: {difference} (tolerancia: {tolerance})"
        )
    return False, (
        f"Diferencia excede tolerancia: declarados {declared}, extraídos {extracted} "
        f"(diferencia: {difference}, tolerancia: {tolerance})"
    ), ""


# ---------------------------------------------------------------------------
# Span / entity / info extraction
# ---------------------------------------------------------------------------

def _extract_spans_direct(text: str) -> list[dict[str, Any]]:
    spans: list[dict[str, Any]] = []
    for field, pat in P.PANAMA_PATTERNS.items():
        for m in pat.finditer(text):
            spans.append(
                {"field": field, "start": m.start(), "end": m.end(), "text": m.group(0)}
            )
    return spans


_DIGIT_RUN = re.compile(r"\d+")
# Every PANAMA_PATTERNS match contains at least one digit, and no match
# extends more than a few dozen chars beyond its digits (prefixes like
# "No. " / "B/. " plus bounded whitespace).  256 gives a wide safety
# margin, and any match that still touches a window edge triggers the
# exact direct path.
_SPAN_WINDOW_MARGIN = 256


def _extend_left(text: str, a: int) -> int:
    """Walk a window start left across long-whitespace bridges.

    The only unbounded parts of PANAMA_PATTERNS are ``\\s*``/``\\s+`` runs
    (money/oficio prefixes, date_es interiors); every other component is
    ≤16 chars.  A match can therefore reach left of ``digit-256`` only via
    whitespace runs, and a pattern has at most 5 such slots.  Each hop
    skips one run (only if ≥8 chars — normal prose never has that, so the
    loop exits immediately on real text) plus one ≤16-char token.
    """
    for _ in range(6):
        j = a
        while j > 0 and text[j - 1].isspace():
            j -= 1
        if a - j < 8:
            break
        k = j
        while k > 0 and not text[k - 1].isspace() and j - k < 16:
            k -= 1
        a = k
    return a


def extract_spans(text: str) -> list[dict[str, Any]]:
    """All Panamanian-pattern matches as span annotations, in fixed
    (pattern-order, position) order. Fields mirror ocr_service.py:746-753.

    Fast path: all six patterns anchor on digits, so the scan runs only
    over merged ±256-char windows around digit runs (~8% of corpus text)
    instead of six full passes.  Window boundaries cannot change ``\\b``
    evaluation for matches strictly inside a window; a match touching a
    window edge (would need >256 chars of digitless run-on) falls back to
    the direct whole-text scan.  Output is byte-identical to the direct
    path (equality-tested over the corpus in test_patterns).
    """
    n = len(text)
    if n <= 4 * _SPAN_WINDOW_MARGIN:
        return _extract_spans_direct(text)
    wins: list[list[int]] = []
    for m in _DIGIT_RUN.finditer(text):
        a, b = m.start() - _SPAN_WINDOW_MARGIN, m.end() + _SPAN_WINDOW_MARGIN
        if a > 0:
            a = _extend_left(text, a)
        if wins and a <= wins[-1][1]:
            if b > wins[-1][1]:
                wins[-1][1] = b
        else:
            wins.append([a if a > 0 else 0, b])
    if not wins:
        return []
    if wins[-1][1] > n:
        wins[-1][1] = n
    spans: list[dict[str, Any]] = []
    for field, pat in P.PANAMA_PATTERNS.items():
        for a, b in wins:
            chunk = text[a:b]
            for m in pat.finditer(chunk):
                if (m.start() == 0 and a > 0) or (m.end() == b - a and b < n):
                    return _extract_spans_direct(text)
                spans.append(
                    {
                        "field": field,
                        "start": a + m.start(),
                        "end": a + m.end(),
                        "text": m.group(0),
                    }
                )
    return spans


# Necessary-literal guards for BASIC_AUTORIDAD (juzgado / tribunal /
# ministerio), aligned 1:1 — each entry is a disjunction: the regex cannot
# match ``text`` unless at least one member is a substring of
# ``text.lower()``. Soundness differs from patterns._TABLE_INDICATOR_GUARDS
# in one way: these regexes search the ORIGINAL text, so a guard literal
# containing a fold-dirty letter must enumerate the ``lower()`` images of
# every codepoint re.IGNORECASE accepts there. For the 'i' in 'terio' that
# class is {I, i, İ U+0130, ı U+0131} (enumerated over the full codepoint
# space), whose lower() images are 'i', 'i', 'i̇' (i + combining dot
# above), 'ı' — hence the three variants. 'juzgado'/'bunal' use only
# single-class letters.
_AUTORIDAD_GUARDS: tuple[tuple[str, ...], ...] = (
    ("juzgado",),
    ("bunal",),
    ("terio", "terıo", "teri̇o"),
)
assert len(_AUTORIDAD_GUARDS) == len(P.BASIC_AUTORIDAD)


def extract_basic_info(text: str, low: str = None) -> dict[str, Optional[str]]:
    """Fallback info extraction (ocr_processor/app.py:547-582):
    first oficio-number match, first authority match, first numeric date.

    ``low`` (``text.lower()``) gates the three authority regexes behind
    cheap substring probes — docs without any authority keyword skip three
    full-document IGNORECASE scans. Output is byte-identical either way
    (guards are necessary conditions; equality pinned in test_patterns).
    """
    if low is None:
        low = text.lower()
    info: dict[str, Optional[str]] = {
        "numero_oficio": None, "autoridad": None, "fecha_emision": None,
    }
    m = P.BASIC_OFICIO.search(text)
    if m:
        info["numero_oficio"] = m.group(1)
    for guards, pat in zip(_AUTORIDAD_GUARDS, P.BASIC_AUTORIDAD):
        if not any(g in low for g in guards):
            continue
        m = pat.search(text)
        if m:
            info["autoridad"] = m.group(1)
            break
    m = P.BASIC_DATE.search(text)  # only the first match is used
    if m:
        info["fecha_emision"] = m.group(1)
    return info


def extract_fecha(text: str) -> Optional[str]:
    """Document date: first Spanish long-form date, else first numeric date —
    feeds the ``informacion_general.fecha`` analog validated at
    ocr_service.py:769-775."""
    m = P.PANAMA_PATTERNS["date_es"].search(text)
    if m:
        return m.group(0)
    m = P.BASIC_DATE.search(text)
    if m:
        return m.group(1)
    return None


def extract_entities(text: str) -> list[dict[str, Any]]:
    """Fallback person extraction (post_ocr_validator.py:98-135): table-row
    regex → {nombre_completo, numero_identificacion, monto, monto_numerico};
    monto string has commas stripped exactly as the reference does."""
    persons: list[dict[str, Any]] = []
    for idx, m in enumerate(P.PERSON_ROW.finditer(text)):
        nombre = m.group(1).strip()
        identificacion = m.group(2).strip()
        monto_str = m.group(3).strip().replace(",", "")
        try:
            monto_numerico = float(monto_str)
        except ValueError:
            monto_numerico = 0.0
        persons.append(
            {
                "nombre_completo": nombre,
                "numero_identificacion": identificacion,
                "numero_ruc": "",
                "numero_cuenta": "",
                "monto": monto_str,
                "monto_numerico": monto_numerico,
                "expediente": "",
                "tipo_persona": "Extraído del texto",
            }
        )
    return persons


# ---------------------------------------------------------------------------
# Validation + confidence
# ---------------------------------------------------------------------------

def validate_panamanian(
    numero_oficio: Optional[str],
    fecha: Optional[str],
    entities: list[dict[str, Any]],
) -> dict[str, Any]:
    """Pattern validation replicating ocr_service.py:726-827 over our columns:

    - ``numero_oficio`` / ``fecha`` each count as one valid or invalid entry;
    - when an entity list is present, every entity's cedula is checked and
      the keys ``clientes_validos`` + ``total_clientes`` are both recorded
      as *valid* entries (exactly as the reference does);
    - score = |valid| / (|valid| + |invalid|); pass iff score >= 0.7.
    """
    valid: dict[str, Any] = {}
    invalid: dict[str, Any] = {}

    if numero_oficio is not None:
        if P.PANAMA_PATTERNS["oficio_number"].search(numero_oficio):
            valid["numero_oficio"] = numero_oficio
        else:
            invalid["numero_oficio"] = numero_oficio
    if fecha is not None:
        if P.PANAMA_PATTERNS["date_es"].search(fecha):
            valid["fecha"] = fecha
        else:
            invalid["fecha"] = fecha

    if entities:
        valid_clientes = 0
        for ent in entities:
            ok = True
            ced = ent.get("numero_identificacion")
            if ced is not None and ced != "":
                if not P.PANAMA_PATTERNS["cedula"].search(ced):
                    ok = False
                    invalid[f"cedula_{ent.get('nombre_completo', 'unknown')}"] = ced
            ruc = ent.get("numero_ruc")
            if ruc:
                if not P.PANAMA_PATTERNS["ruc"].search(ruc):
                    ok = False
                    invalid[f"ruc_{ent.get('nombre_completo', 'unknown')}"] = ruc
            if ok:
                valid_clientes += 1
        valid["clientes_validos"] = valid_clientes
        valid["total_clientes"] = len(entities)

    total = len(valid) + len(invalid)
    score = (len(valid) / total) if total > 0 else 0.0
    return {
        "valid_count": len(valid),
        "invalid_count": len(invalid),
        "confidence_score": score,
        "validation_passed": score >= P.VALIDATION_PASS_THRESHOLD,
    }


def derive_confidence(
    has_text: bool, has_structured: bool, validation: Optional[dict[str, Any]]
) -> str:
    """Confidence ladder (ocr_service.py:629-638): base high/medium/low from
    structured+text presence, then promoted to high on validation pass and
    demoted to low when the validation score drops under 0.5."""
    confidence = "high" if (has_structured and has_text) else ("medium" if has_text else "low")
    if validation is not None:
        if validation.get("validation_passed"):
            confidence = "high"
        elif validation.get("confidence_score", 0.0) < 0.5:
            confidence = "low"
    return confidence


def accept_result(
    success: bool, extracted_text: str, type_id: int, n_entities: int
) -> bool:
    """Downstream result-acceptance predicate (crm_integrator/app.py:153-223
    parity): a result is consumable iff it succeeded AND carries at least
    one of extracted text / classification / structured entities."""
    return bool(
        success and (extracted_text or type_id > 0 or n_entities > 0)
    )


# ---------------------------------------------------------------------------
# Whole-segment annotation
# ---------------------------------------------------------------------------

def annotate_segment(text: str) -> dict[str, Any]:
    """Full annotation of one segment's extracted text → flat dict of the
    output columns (schema assembled by the stage wrapper)."""
    low = text.lower()
    info = extract_basic_info(text, low=low)
    fecha = extract_fecha(text)
    entities = extract_entities(text)
    type_id, label, tramite, departamento = classify_text(text, low=low)
    keywords = matched_keywords(text, low=low)
    spans = extract_spans(text)
    monto_total = float(sum(e["monto_numerico"] for e in entities))

    has_structured = bool(type_id > 0 or entities or info["numero_oficio"])
    validation = (
        validate_panamanian(info["numero_oficio"], fecha, entities)
        if has_structured
        else None
    )
    confidence = derive_confidence(bool(text), has_structured, validation)

    return {
        "numero_oficio": info["numero_oficio"] or "",
        "autoridad": info["autoridad"] or "",
        "fecha": fecha or "",
        "fecha_emision": info["fecha_emision"] or "",
        "type_id": type_id,
        "type_label": label,
        "tramite": tramite,
        "departamento": departamento,
        "keywords": keywords,
        "spans": spans,
        "entities": entities,
        "n_entities": len(entities),
        "monto_total": monto_total,
        "should_have_persons": P.should_have_persons(text, low=low),
        "confidence_score": validation["confidence_score"] if validation else 0.0,
        "validation_passed": bool(validation and validation["validation_passed"]),
        "confidence": confidence,
    }
