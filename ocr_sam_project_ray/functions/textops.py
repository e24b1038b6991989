"""Scalar text / number / date normalization functions.

Behavioral parity targets (cited into /root/reference; fresh code):
- clean_text / normalize_company_name / extract_numbers: src/shared/utils.py:64-111
- clean_value: src/ocr_processor/app.py:526-537
- safe_string / safe_date / safe_number: src/crm_integrator/app.py:454-491
- Spanish + numeric date parser: src/crm_integrator/app.py:692-742
- monto parse (strip "B/." and ","): src/ocr_processor/app.py:487-495
- name split, flavor A: src/ocr_processor/app.py:499-503
- name split, flavor B (surnames-last): src/crm_integrator/app.py:377-394
- brace-scan JSON recovery from free text: src/services/mistral_service.py:241-273
- tolerant maybe-string-maybe-dict coerce: src/ocr_processor/app.py:346-357
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from typing import Any, Optional

_WS = re.compile(r"\s+")
_PUNCT_FILTER = re.compile(r"[^\w\s.,;:!?()-]")
_COMPANY_PREFIX = re.compile(r"^(s\.?a\.?|s\.?r\.?l\.?|ltda\.?|inc\.?|corp\.?)\s*", re.IGNORECASE)
_COMPANY_SUFFIX = re.compile(r"\s+(s\.?a\.?|s\.?r\.?l\.?|ltda\.?|inc\.?|corp\.?)$", re.IGNORECASE)
_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_NON_DATE_CHARS = re.compile(r"[^\d\/\-\.]")

SPANISH_MONTHS = {
    "enero": "01", "febrero": "02", "marzo": "03", "abril": "04",
    "mayo": "05", "junio": "06", "julio": "07", "agosto": "08",
    "septiembre": "09", "octubre": "10", "noviembre": "11", "diciembre": "12",
}

_NUMERIC_DATE_FORMATS = ["%d/%m/%Y", "%d-%m-%Y", "%d.%m.%Y", "%Y-%m-%d", "%d/%m/%y", "%d-%m-%y"]


def clean_text(text: Optional[str]) -> str:
    """Collapse whitespace, drop chars outside basic punctuation (utils.py:68-79)."""
    if not text:
        return ""
    text = _WS.sub(" ", text)
    text = _PUNCT_FILTER.sub("", text)
    return text.strip()


def clean_value(value: Any) -> str:
    """None/'null' → '', numbers → str, strings stripped (ocr_processor/app.py:526-537)."""
    if value is None or value == "null":
        return ""
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, (int, float)):
        return str(value)
    if isinstance(value, str):
        return value.strip()
    return str(value).strip()


def extract_numbers(text: str) -> list[int]:
    """All integer runs in the text (utils.py:82-85)."""
    return [int(n) for n in re.findall(r"\d+", text or "")]


def normalize_company_name(name: Optional[str]) -> str:
    """Strip corporate suffixes/prefixes and title-case (utils.py:88-97)."""
    if not name:
        return "No especificado"
    name = _COMPANY_PREFIX.sub("", name)
    name = _COMPANY_SUFFIX.sub("", name)
    return name.strip().title()


def safe_string(value: Any, max_length: Optional[int] = None, default: str = "") -> str:
    """Null-sentinel handling + control-char strip + truncate-with-ellipsis
    (crm_integrator/app.py:454-466)."""
    if value is None or str(value).strip() in ("", "null", "None", "No especificado"):
        return default
    out = str(value).strip()
    out = out.replace("\x00", "").replace("\r", "").replace("\n", " ")
    if max_length and len(out) > max_length:
        out = out[: max_length - 3] + "..."
    return out


def safe_date(date_str: Any) -> str:
    """Pass ISO-formatted dates through, else the 1900-01-01 sentinel
    (crm_integrator/app.py:467-475)."""
    if not date_str or date_str in ("No especificado", "No especificada", "", "null", None):
        return "1900-01-01"
    if _ISO_DATE.match(str(date_str)):
        return str(date_str)
    return "1900-01-01"


def safe_number(value: Any, default: float = 0.0) -> float:
    """Strip currency markers, parse, clamp to [0, 999999999]
    (crm_integrator/app.py:477-491)."""
    try:
        if value is None or str(value).strip() in ("", "null", "None"):
            return default
        cleaned = str(value).replace("B/.", "").replace(",", "").strip()
        number = float(cleaned) if cleaned else default
        if number < 0:
            return 0.0
        if number > 999999999:
            return 999999999.0
        return number
    except (ValueError, TypeError):
        return default


def parse_date_es(date_str: Optional[str], nullable: bool = True) -> Optional[str]:
    """Spanish long-form and numeric date parser → 'YYYY-MM-DD'
    (crm_integrator/app.py:692-742). Returns None (nullable) or the
    1900-01-01 sentinel when unparseable."""
    sentinel = None if nullable else "1900-01-01"
    if not date_str or date_str in ("No especificado", "No especificada", "", "null", None):
        return sentinel

    date_clean = date_str.strip()

    # "23 de mayo de 2025" long form
    if " de " in date_clean.lower():
        parts = date_clean.lower().split()
        if len(parts) >= 5 and parts[1] == "de" and parts[3] == "de":
            dia = parts[0].zfill(2)
            mes = SPANISH_MONTHS.get(parts[2])
            anio = parts[4]
            if mes and anio.isdigit():
                return f"{anio}-{mes}-{dia}"

    # Numeric forms: strip everything but digits and separators
    numeric = _NON_DATE_CHARS.sub("", date_str)
    if not numeric:
        return sentinel
    for fmt in _NUMERIC_DATE_FORMATS:
        try:
            return datetime.strptime(numeric, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return sentinel


def parse_monto(monto_str: Any) -> float:
    """Currency string → float; 0.0 on failure (ocr_processor/app.py:487-495)."""
    if monto_str is None:
        return 0.0
    try:
        cleaned = str(monto_str).replace("B/.", "").replace(",", "").strip()
        return float(cleaned) if cleaned else 0.0
    except (ValueError, TypeError):
        return 0.0


def split_name(nombre_completo: str) -> dict[str, str]:
    """Name split, flavor A (ocr_processor/app.py:499-503):
    tok0 → nombre, tok1 → apellido_paterno, tok2 → apellido_materno,
    tok3+ → nombre_segundo."""
    tokens = (nombre_completo or "").split()
    return {
        "nombre": tokens[0] if tokens else "",
        "apellido_paterno": tokens[1] if len(tokens) > 1 else "",
        "apellido_materno": tokens[2] if len(tokens) > 2 else "",
        "nombre_segundo": " ".join(tokens[3:]) if len(tokens) > 3 else "",
    }


def recover_json(response: Optional[str]) -> dict[str, Any]:
    """Brace-scan JSON recovery from free text (mistral_service.py:241-273):
    take the substring from the first '{' to the last '}' and json-parse it;
    a parsed dict is returned as-is.  No braces / non-dict payload → the
    reference's "No identificado" fallback structure; a parse error → the
    "Error de parsing" structure carrying the decoder message.  Both
    fallbacks echo the raw text under ``raw_response``."""
    text = response or ""
    try:
        start = text.find("{")
        end = text.rfind("}") + 1
        if start >= 0 and end > start:
            parsed = json.loads(text[start:end])
            if isinstance(parsed, dict):
                return parsed
        return {
            "tipo_documento": "No identificado",
            "nivel_confianza": "bajo",
            "informacion_clave": {},
            "raw_response": text,
        }
    except json.JSONDecodeError as exc:
        return {
            "tipo_documento": "Error de parsing",
            "nivel_confianza": "bajo",
            "informacion_clave": {},
            "parsing_error": str(exc),
            "raw_response": text,
        }


def coerce_structured(value: Any) -> dict[str, Any]:
    """Tolerant maybe-string-maybe-dict coerce (ocr_processor/app.py:346-357):
    a JSON-parsable string → its dict; an unparsable string → wrapped as
    ``{"texto_completo": s}``; a dict → as-is; anything else stringified
    into the same wrapper.  A string that parses to a non-dict JSON value
    (e.g. a list) also takes the wrapper, keeping the return type stable."""
    if isinstance(value, dict):
        return value
    if isinstance(value, str):
        try:
            parsed = json.loads(value)
            if isinstance(parsed, dict):
                return parsed
        except json.JSONDecodeError:
            pass
        return {"texto_completo": value}
    return {"texto_completo": str(value)}


def split_name_b(nombre_completo: str) -> dict[str, str]:
    """Name split, flavor B (crm_integrator/app.py:377-394, the
    NdosPersonasOCR schema convention): surnames come LAST —
    tok0 → nombre, middle tokens → nombre_segundo, tok[-2] →
    apellido_paterno (≥2 tokens), tok[-1] → apellido_materno (≥3 tokens).
    Faithfully reproduces the reference's 2-token quirk where
    apellido_paterno == nombre (tokens[-2] of a 2-list is tokens[0])."""
    tokens = (nombre_completo or "").split()
    return {
        "nombre": tokens[0] if tokens else "",
        "nombre_segundo": " ".join(tokens[1:-2]) if len(tokens) > 3 else "",
        "apellido_paterno": tokens[-2] if len(tokens) >= 2 else "",
        "apellido_materno": tokens[-1] if len(tokens) >= 3 else "",
    }
