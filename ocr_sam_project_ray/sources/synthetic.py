"""Deterministic synthetic Common-Crawl-style page corpus + goldens.

Produces the exact input shape from BASELINE.json's ``input_hint``::

    pages:  (url: string, warc_ts: timestamp[us], html: binary,
             text: string, lang: string)

plus three golden tables that define the engine's correctness contract
(FIXTURES.md §2):

    golden_pages:    (url, warc_ts, success, error, extracted_text)
                     one row per url surviving dedup; ``extracted_text`` is
                     the byte-identical contract
    golden_segments: one row per post-split sub-document with annotation
                     expectations (classification from the *sampled* type,
                     entity counts/montos from the *rendered* table rows)
    golden_entities: one row per rendered person-table row

Document structures exercise every reference-derived operator (FIXTURES.md
§1): config blocks (metadata_service.py patterns), separator lines
(pdf_service.py:78-95), persona tables matching the fallback row regex
(post_ocr_validator.py:108), Panamanian patterns (ocr_service.py:746-753),
the 16-type keyword triggers, link-farm boilerplate, url duplicates for
dedup, malformed payloads for the validator error path, and a size-skew
tail.

Every golden value is either composed directly by the generator (text,
segment boundaries, type, entities) or derived by the unit-tested pure
functions; the generator *asserts* at build time that the composed pages
round-trip through the real extractor byte-identically, so a drift between
generator and engine fails loudly at generation, never silently at test
time. Seeded via ``random.Random(f"{seed}:{index}")``; no wall-clock anywhere.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import extract_core as core
from ..functions.classify import TAXONOMY_BY_ID, classify_text, is_urgent, priority_for
from ..functions.html_text import extract_main_text

MIN_HTML_BYTES = 1024          # analog of validators.py:19-20 (1 KB – 50 MB)
MAX_HTML_BYTES = 50 * 1024 * 1024

_BASE_TS = datetime(2025, 1, 1)

# body sentences: deliberately free of trigger keywords, separator markers,
# config keys, and table-indicator substrings (see tests/test_synthetic.py)
_SENTENCES = [
    "Por medio del presente se comunica la medida cautelar decretada dentro del "
    "expediente arriba indicado.",
    "Se solicita a la entidad bancaria verificar los saldos disponibles y remitir "
    "respuesta en un plazo de cinco dias habiles.",
    "La autoridad competente requiere la colaboracion de conformidad con las "
    "normas vigentes del codigo judicial.",
    "Los montos retenidos deberan mantenerse a disposicion del despacho judicial "
    "hasta nueva orden.",
    "Se advierte que el incumplimiento de la presente orden acarrea las sanciones "
    "establecidas por la ley.",
    "El despacho agradece la pronta gestion y queda atento a cualquier consulta "
    "adicional sobre el caso.",
    "La medida recae sobre los bienes y valores que se encuentren bajo custodia "
    "de la institucion financiera.",
    "Remitase copia autenticada de la presente resolucion a las partes "
    "interesadas del proceso.",
]

_TRIGGER_PHRASES = {
    1: "secuestro", 2: "aprehensión", 3: "traslado de fondos", 4: "levantamiento",
    5: "embargo", 6: "adjudicación", 7: "investigación de sucesión",
    8: "solo notificación", 9: "citación", 10: "investigación civil",
    11: "investigación de familia", 12: "proceso penal",
    13: "información de clientes", 14: "inspección ocular", 15: "allanamiento",
    16: "diligencia exhibitoria",
}

_PERSON_NAMES = [
    "MARIA GOMEZ LOPEZ", "PEDRO ANTONIO RIOS", "COMERCIAL LA ESTRELLA, S.A.",
    "JUAN CARLOS MARTINEZ", "ANA SOFIA DELGADO", "INVERSIONES DEL ISTMO",
    "LUIS ALBERTO PINZON", "CARMEN ROSA NAVARRO", "DISTRIBUIDORA EL SOL",
    "ROSA ELENA VASQUEZ",
]

_COMPANIES = [
    "Banco General de Occidente", "Financiera La Central",
    "Cooperativa San Judas", "Banco del Agro Continental",
]
_PROVINCES = ["Panama", "Colon", "Chiriqui", "Veraguas", "Los Santos"]
_OPERATORS = ["Luis Serrano", "Marta Quintero", "Jose Dominguez"]
_JUZGADOS = ["Primero", "Segundo", "Tercero", "Cuarto", "Quinto"]

_NAV_LINKS = ["Inicio", "Tramites", "Consultas", "Directorio", "Transparencia",
              "Servicios", "Normativa", "Contacto"]


def _nav_html(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{w.lower()}">{w}</a> ' for w in rng.sample(_NAV_LINKS, 6)
    )
    return f'<div class="nav">{links}</div>'


def _footer_html(rng: random.Random, url: str = "") -> str:
    links = "".join(
        f'<a href="/f/{w.lower()}">{w}</a> ' for w in rng.sample(_NAV_LINKS, 5)
    )
    # v9: three ABSOLUTE cross-host links (the web-graph fixture for
    # ops/linkgraph.py). Drawn from a url-derived rng so the page's main
    # rng stream — and therefore every golden — is untouched; targets are
    # quadratically skewed toward low portal numbers so the host graph has
    # hubs (hot in-degree) for PageRank / skew tests to bite on.
    xrng = random.Random(f"xlinks:{url}")
    xlinks = "".join(
        '<a href="https://portal{j}.example.pa/{w}">{t}</a> '.format(
            j=int(40 * xrng.random() ** 2),
            w=(w := xrng.choice(_NAV_LINKS)).lower(),
            t=w,
        )
        for _ in range(3)
    )
    # the short no-link copyright line after a linky block stays NEAR →
    # dropped (tests the isolated-short-paragraph rule)
    return (
        f'<div class="footer">{links}{xlinks}</div>'
        f"<div><p>Derechos reservados 2025</p></div>"
    )


def _oficio_number(rng: random.Random) -> str:
    prefix = rng.choice(["JE", "DJ"])
    return f"{prefix}-{rng.randrange(100, 9999)}-2025"


def _cedula(rng: random.Random, valid: bool) -> str:
    if valid:
        ced = f"{rng.randrange(1, 10)}-{rng.randrange(100, 1000)}-{rng.randrange(1000, 10000)}"
        if rng.random() < 0.4:
            ced += f", D.V. {rng.randrange(10, 100)}"
        return ced
    return f"{rng.randrange(100, 999)}-{rng.randrange(10000, 99999)}-{rng.randrange(10000, 99999)}"


def _monto(rng: random.Random) -> float:
    # spread over priority thresholds (>10000 Medium, >50000 High)
    bucket = rng.random()
    if bucket < 0.6:
        return round(rng.uniform(50, 9000), 2)
    if bucket < 0.9:
        return round(rng.uniform(10000, 49000), 2)
    return round(rng.uniform(50001, 90000), 2)


class _Oficio:
    """One sub-document: composed paragraph lines + known expectations."""

    def __init__(self, rng: random.Random, big: bool, body_scale: int = 1):
        self.type_id = rng.randrange(1, 17)
        self.numero = _oficio_number(rng)
        self.lines: list[str] = []
        self.persons: list[dict] = []

        juz = rng.choice(_JUZGADOS)
        prov = rng.choice(_PROVINCES)
        self.lines.append(f"OFICIO: {self.numero}")
        self.lines.append(
            f"Juzgado {juz} de Circuito Civil de la Provincia de {prov} hace constar "
            f"lo siguiente en atencion al tramite en curso."
        )
        self.lines.append(
            f"Se ordena la medida de {_TRIGGER_PHRASES[self.type_id]} conforme a "
            f"derecho dentro del presente proceso."
        )
        if rng.random() < 0.85:
            dia = rng.randrange(1, 29)
            mes = rng.choice(["enero", "marzo", "mayo", "julio", "octubre"])
            self.lines.append(f"Dado en la ciudad de Panama a los {dia} de {mes} de 2025.")
        else:
            self.lines.append(
                f"Fechado el {rng.randrange(1, 29):02d}/{rng.randrange(1, 13):02d}/2025 "
                f"en el despacho judicial."
            )
        if rng.random() < 0.5:
            self.lines.append(
                f"El monto retenido asciende a B/. {_monto(rng):,.2f} segun consta en autos."
            )
        n_body = (
            rng.randrange(200 * body_scale, 900 * body_scale)
            if big
            else rng.randrange(2 * body_scale, 6 * body_scale)
        )
        for _ in range(n_body):
            self.lines.append(rng.choice(_SENTENCES))

        # persona table (~55%)
        self.has_table = rng.random() < 0.55
        if self.has_table:
            self.lines.append(
                "Detalle de las personas afectadas por la presente medida segun el "
                "registro que se transcribe a continuacion."
            )
            self.lines.append("Detalle | Agente Económico | Identificacion | Monto en balboas")
            for _ in range(rng.randrange(1, 5)):
                name = rng.choice(_PERSON_NAMES)
                ced = _cedula(rng, valid=rng.random() < 0.8)
                amt = _monto(rng)
                self.lines.append(f"{name} | {ced} | {amt:,.2f}")
                self.persons.append(
                    {
                        "nombre_completo": name,
                        "numero_identificacion": ced,
                        "monto": f"{amt:,.2f}".replace(",", ""),
                        "monto_numerico": float(f"{amt:,.2f}".replace(",", "")),
                    }
                )

    def html(self) -> str:
        parts = []
        for ln in self.lines:
            if " | " in ln and not ln.startswith("Detalle"):
                cells = "".join(f"<td>{c}</td>" for c in ln.split(" | "))
                parts.append(f"<tr>{cells}</tr>")
            elif ln.startswith("Detalle | "):
                cells = "".join(f"<td>{c}</td>" for c in ln.split(" | "))
                parts.append(f"<table><tr>{cells}</tr>")
            else:
                parts.append(f"<p>{ln}</p>")
        html = []
        open_table = False
        for p in parts:
            if p.startswith("<table>"):
                if open_table:
                    html.append("</table>")
                html.append(p)
                open_table = True
            elif p.startswith("<tr>"):
                html.append(p)
            else:
                if open_table:
                    html.append("</table>")
                    open_table = False
                html.append(p)
        if open_table:
            html.append("</table>")
        return "".join(html)


def _compose_page(rng: random.Random, url: str, body_scale: int = 1):
    """Build one page: html bytes + expected doc text / segments / metadata."""
    n_oficios = rng.choices([1, 2, 3], weights=[70, 20, 10])[0]
    big = rng.random() < 0.02
    has_config = rng.random() < 0.5

    config_lines: list[str] = []
    declared = n_oficios
    company = ""
    if has_config:
        roll = rng.random()
        if roll < 0.10:
            declared = n_oficios + 1          # within tolerance for small counts
        elif roll < 0.15:
            declared = n_oficios + 4          # outside tolerance → count invalid
        company = rng.choice(_COMPANIES)
        config_lines = [
            f"Empresa: {company}",
            f"Cantidad: {declared}",
            f"Origen: Provincia de {rng.choice(_PROVINCES)}",
            f"Operador: {rng.choice(_OPERATORS)}",
        ]

    oficios = [_Oficio(rng, big and k == 0, body_scale) for k in range(n_oficios)]
    separators = [
        rng.choice(["SEPARADOR DE OFICIOS", "=====================", "--- DIVISOR ---"])
        for _ in range(n_oficios - 1)
    ]

    # expected document text = config + oficio lines with separators between
    doc_lines: list[str] = list(config_lines)
    expected_segments: list[list[str]] = []
    for k, ofc in enumerate(oficios):
        seg_lines = (config_lines + ofc.lines) if k == 0 else list(ofc.lines)
        expected_segments.append(seg_lines)
        if k == 0:
            doc_lines.extend(ofc.lines)
        else:
            doc_lines.append(separators[k - 1])
            doc_lines.extend(ofc.lines)

    # html assembly
    body = [_nav_html(rng)]
    if config_lines:
        body.append("<div>" + "".join(f"<p>{ln}</p>" for ln in config_lines) + "</div>")
    for k, ofc in enumerate(oficios):
        if k > 0:
            body.append(f"<div><p>{separators[k - 1]}</p></div>")
        body.append(f'<div class="oficio">{ofc.html()}</div>')
    body.append(_footer_html(rng, url))

    html = (
        "<!DOCTYPE html><html><head><title>Portal Judicial</title>"
        '<meta charset="utf-8"><style>body{font-family:serif}</style>'
        "<script>var x = 1;</script></head><body>"
        + "".join(body)
        + "</body></html>"
    )
    raw = html.encode("utf-8")
    if len(raw) < MIN_HTML_BYTES:
        raw += b"<!-- " + b"p" * (MIN_HTML_BYTES - len(raw)) + b" -->"

    expected_text = "\n".join(doc_lines)
    return raw, expected_text, expected_segments, oficios, declared, has_config, company


def _render_pdf_like(rng: random.Random, doc_lines: list[str]) -> bytes:
    """Render the composed document as a GENUINE PDF file (round-3:
    functions/pdf_build.py — real xref/page-tree/FlateDecode structure,
    text placed with Tm/Td/TD/T*/Tj/'/TJ operators over literal AND hex
    strings). The layout parser must perform REAL work to recover
    ``doc_lines`` byte-identically:

    - text blocks are SCRAMBLED within each content stream → (y, x)
      reading-order sort over interpreted coordinates;
    - ~half of the pages are laid out in TWO COLUMNS (x∈[50,120) and
      x∈[320,390), both restarting at y=720) → naive global sorting
      interleaves the columns and fails; intra-column x jitter stays
      narrower than COLUMN_GAP so detection is unambiguous;
    - multi-page documents carry a repeated HEADER (y=768) and FOOTER
      (y=24) on every page → suppressed by the repetition heuristic;
    - some pages carry a size-4 WATERMARK → suppressed by font size;
    - structure varies: compressed streams, /Contents arrays (~20% of
      pages), nested /Pages trees (~25% of 3+-page docs).

    The expected text is composed FIRST (doc_lines); this renderer only
    encodes it — the parser is never consulted during generation."""
    from ..functions.pdf_build import build_pdf, text_block

    # paginate by per-page capacity (content band 720 → ~250 holds ≤40
    # 12-pt-leading lines per column, well clear of the footer band)
    chunks: list[tuple[list[str], bool]] = []
    i = 0
    while i < len(doc_lines):
        cap = rng.randrange(18, 41)
        two_cols = rng.random() < 0.5 and len(doc_lines) - i >= 6
        take = min(len(doc_lines) - i, cap * 2 if two_cols else cap)
        chunks.append((doc_lines[i : i + take], two_cols))
        i += take
    n_pages = len(chunks)
    header = f"DOC-{rng.randrange(10**6)} EXPEDIENTE CONFIDENCIAL"
    footer = "documento generado automaticamente - no firmar"

    pages = []
    for chunk, two_cols in chunks:
        blocks: list[str] = []

        def emit_column(lines: list[str], x_lo: int, x_hi: int) -> None:
            # blocks of 1-4 sequential lines (relative T*/Td/' motion);
            # block ORDER is scrambled below — absolute Tm anchors each
            j = 0
            y = 720
            while j < len(lines):
                blen = min(rng.randrange(1, 5), len(lines) - j)
                seg: list = []
                for ln in lines[j : j + blen]:
                    style = rng.random()
                    if style < 0.15 and len(ln) > 4:
                        cut = rng.randrange(1, len(ln) - 1)
                        seg.append(("tj_array",
                                    [ln[:cut], rng.randrange(-120, -10),
                                     ln[cut:]]))
                    elif style < 0.25:
                        seg.append(("hex", ln))
                    elif style < 0.35 and seg:
                        seg.append(("quote", ln))
                    else:
                        seg.append(ln)
                blocks.append(text_block(
                    rng.randrange(x_lo, x_hi), y, rng.choice([9, 10, 11]),
                    seg, leading=12, relative=rng.random() < 0.7,
                    use_td=rng.random() < 0.3,
                ))
                y -= 12 * blen
                j += blen

        if two_cols:
            k = (len(chunk) + 1) // 2
            emit_column(chunk[:k], 50, 120)
            emit_column(chunk[k:], 320, 390)
        else:
            emit_column(chunk, 50, 150)
        if n_pages >= 2:  # repeated boilerplate — parser must suppress
            blocks.append(text_block(rng.randrange(50, 150), 768, 9, [header]))
            blocks.append(text_block(rng.randrange(50, 150), 24, 8, [footer]))
        if rng.random() < 0.3:  # fine-print watermark — dropped by size
            blocks.append(text_block(rng.randrange(50, 150),
                                     rng.randrange(150, 600), 4, ["BORRADOR"]))
        rng.shuffle(blocks)
        pages.append(blocks)

    split = frozenset(p for p in range(n_pages) if rng.random() < 0.2)
    return build_pdf(
        pages,
        compress=True,
        pad_to=MIN_HTML_BYTES,
        nested_tree=(n_pages >= 3 and rng.random() < 0.25),
        split_contents_pages=split,
    )


def _malformed_page(rng: random.Random):
    mode = rng.choice(["empty", "truncated", "tiny", "junk", "pdf_noeof"])
    if mode == "pdf_noeof":
        # a structurally real PDF torn before its %%EOF marker
        from ..functions.pdf_build import build_pdf, text_block

        blocks = [
            text_block(50, 720 - 12 * i, 10, ["contenido truncado"])
            for i in range(20)
        ]
        raw = build_pdf([blocks], compress=True, pad_to=MIN_HTML_BYTES,
                        drop_eof=True)
        return raw, "Invalid PDF file: missing EOF marker"
    if mode == "empty":
        return b"", "HTML too small: 0 bytes (min: %d)" % MIN_HTML_BYTES
    if mode == "tiny":
        raw = b"<!DOCTYPE html><html><body><p>x</p></body></html>"
        return raw, f"HTML too small: {len(raw)} bytes (min: {MIN_HTML_BYTES})"
    if mode == "junk":
        raw = bytes(rng.randrange(128, 256) for _ in range(4096))
        return raw, "Invalid HTML file: missing DOCTYPE header"
    raw = ("<!DOCTYPE html><html><body>" + "<p>contenido truncado</p>" * 80).encode()
    if len(raw) < MIN_HTML_BYTES:
        raw += b"<!-- " + b"p" * MIN_HTML_BYTES + b" -->"
    return raw, "Invalid HTML file: missing closing html tag"


def generate_corpus(
    n_pages: int, seed: int = 42, check: bool = True, body_scale: int = 1,
    check_stride: int = 1,
):
    """Build (pages, golden_pages, golden_segments, golden_entities) tables.

    ``body_scale`` multiplies per-oficio body length (bench tiers use larger
    pages so compute dominates fixed costs); ``check_stride`` runs the
    generator/extractor round-trip assert on every k-th page (1 = all)."""
    pages = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    gp_cols = ["url", "warc_ts", "success", "error", "extracted_text",
               "empresa", "declared_count", "has_config", "count_valid",
               "n_segments"]
    gp = {c: [] for c in gp_cols}
    gs_cols = [
        "doc_id", "url", "seg_index", "n_segments", "extracted_text", "type_id",
        "type_label", "tramite", "departamento", "n_entities", "monto_total",
        "declared_count", "count_valid", "has_config", "priority", "urgent",
    ]
    gs = {c: [] for c in gs_cols}
    ge_cols = ["doc_id", "seq", "nombre_completo", "numero_identificacion",
               "monto", "monto_numerico"]
    ge = {c: [] for c in ge_cols}

    for i in range(n_pages):
        rng = random.Random(f"{seed}:{i}")
        url = f"https://portal{rng.randrange(40)}.example.pa/oficios/{i:07d}"
        ts = _BASE_TS + timedelta(seconds=i * 97 + rng.randrange(50))
        lang = rng.choices(["es", "en", "other"], weights=[80, 15, 5])[0]

        do_check = check and (i % check_stride == 0)
        malformed = rng.random() < 0.04
        if malformed:
            raw, err = _malformed_page(rng)
            pages["url"].append(url)
            pages["warc_ts"].append(ts)
            pages["html"].append(raw)
            pages["text"].append("")
            pages["lang"].append(lang)
            gp["url"].append(url)
            gp["warc_ts"].append(ts)
            gp["success"].append(False)
            gp["error"].append(err)
            gp["extracted_text"].append("")
            gp["empresa"].append("")
            gp["declared_count"].append(0)
            gp["has_config"].append(False)
            gp["count_valid"].append(False)
            gp["n_segments"].append(0)
            continue

        raw, expected_text, expected_segments, oficios, declared, has_config, \
            config_company = _compose_page(rng, url, body_scale)

        # ~10% of valid pages carry the PDF-like payload (layout-parse path);
        # the expected text is IDENTICAL — downstream stages are payload-
        # agnostic, only the extractor routes differently
        as_pdf = rng.random() < 0.10
        if as_pdf:
            doc_lines_now = expected_text.split("\n")
            raw = _render_pdf_like(rng, doc_lines_now)

        if do_check:
            from ..functions.pdf_text import extract_pdf_like_text

            got = extract_pdf_like_text(raw) if as_pdf else extract_main_text(raw)
            assert got == expected_text, (
                f"generator/extractor drift at {url}:\n"
                f"expected {expected_text[:400]!r}...\ngot {got[:400]!r}..."
            )
            segs = core.split_segments(expected_text)
            assert segs == ["\n".join(s) for s in expected_segments], url

        pages["url"].append(url)
        pages["warc_ts"].append(ts)
        pages["html"].append(raw)
        pages["text"].append(expected_text[:200])
        pages["lang"].append(lang)

        n_seg = len(expected_segments)
        count_valid, _, _ = core.validate_count(n_seg, declared if has_config else 0)
        empresa = ""
        if has_config:
            # parse_metadata lowercases, so the expectation is the lowercased
            # company; assert the parser agrees with the composed config block
            empresa = config_company.lower()
            if do_check:
                parsed = core.parse_metadata(expected_text)
                assert parsed["empresa"] == empresa, (url, parsed["empresa"], empresa)
                assert parsed["cantidad_oficios_declarada"] == declared, url
            assert core.parse_metadata_has_config(expected_text) is True, url
        elif do_check:
            assert core.parse_metadata_has_config(expected_text) is False, url

        gp["url"].append(url)
        gp["warc_ts"].append(ts)
        gp["success"].append(True)
        gp["error"].append("")
        gp["extracted_text"].append(expected_text)
        gp["empresa"].append(empresa)
        gp["declared_count"].append(declared if has_config else 0)
        gp["has_config"].append(has_config)
        gp["count_valid"].append(bool(count_valid))
        gp["n_segments"].append(n_seg)
        for k, (seg_lines, ofc) in enumerate(zip(expected_segments, oficios)):
            seg_text = "\n".join(seg_lines)
            doc_id = core.mint_doc_id(url, k, n_seg)
            tid, label, tramite, depto = TAXONOMY_BY_ID[ofc.type_id]
            if do_check:
                assert classify_text(seg_text)[0] == tid, (url, k, seg_text[:200])
                got_ents = core.extract_entities(seg_text)
                assert [e["nombre_completo"] for e in got_ents] == [
                    p["nombre_completo"] for p in ofc.persons
                ], (url, k)
                assert [e["monto_numerico"] for e in got_ents] == [
                    p["monto_numerico"] for p in ofc.persons
                ], (url, k)
            monto_total = float(sum(p["monto_numerico"] for p in ofc.persons))
            gs["doc_id"].append(doc_id)
            gs["url"].append(url)
            gs["seg_index"].append(k)
            gs["n_segments"].append(n_seg)
            gs["extracted_text"].append(seg_text)
            gs["type_id"].append(tid)
            gs["type_label"].append(label)
            gs["tramite"].append(tramite)
            gs["departamento"].append(depto)
            gs["n_entities"].append(len(ofc.persons))
            gs["monto_total"].append(monto_total)
            gs["declared_count"].append(declared if has_config else 0)
            gs["count_valid"].append(bool(count_valid))
            gs["has_config"].append(has_config)
            gs["priority"].append(priority_for(label, monto_total))
            gs["urgent"].append(is_urgent(label))
            for s, p in enumerate(ofc.persons):
                ge["doc_id"].append(doc_id)
                ge["seq"].append(s + 1)
                ge["nombre_completo"].append(p["nombre_completo"])
                ge["numero_identificacion"].append(p["numero_identificacion"])
                ge["monto"].append(p["monto"])
                ge["monto_numerico"].append(p["monto_numerico"])

        # ~6% of pages get a duplicate row with an EARLIER warc_ts (dedup
        # keeps max warc_ts, so the golden row above stays the winner)
        if rng.random() < 0.06:
            dup_ts = ts - timedelta(seconds=rng.randrange(3600, 86400))
            dup_html = raw if rng.random() < 0.5 else raw + b"<!-- stale crawl -->"
            pages["url"].append(url)
            pages["warc_ts"].append(dup_ts)
            pages["html"].append(dup_html)
            pages["text"].append(expected_text[:200])
            pages["lang"].append(lang)

    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    pages_t = pa.table(pages, schema=schema)
    gp_t = pa.table(gp, schema=pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("success", pa.bool_()), ("error", pa.string()),
        ("extracted_text", pa.string()), ("empresa", pa.string()),
        ("declared_count", pa.int64()), ("has_config", pa.bool_()),
        ("count_valid", pa.bool_()), ("n_segments", pa.int64()),
    ]))
    gs_t = pa.table(gs)
    ge_t = pa.table(ge)
    return pages_t, gp_t, gs_t, ge_t


def split_offsets_by_url(pages_t: pa.Table, n_files: int) -> list[tuple[int, int]]:
    """Row ranges for writing the pages table as ``n_files`` shards WITHOUT
    splitting a url's duplicate run across files (duplicates are emitted
    adjacently). Shard-local dedup therefore sees all copies of a url —
    the partitioning assumption the resumable runner documents."""
    n = pages_t.num_rows
    urls = pages_t["url"].to_pylist()
    target = max(1, n // n_files)
    offsets = []
    start = 0
    while start < n:
        end = min(start + target, n)
        while end < n and urls[end] == urls[end - 1]:
            end += 1
        offsets.append((start, end))
        start = end
    return offsets


# ---------------------------------------------------------------------------
# On-disk cache keyed by scale name
# ---------------------------------------------------------------------------

CACHE_ROOT = os.environ.get("OCR_SAM_RAY_CORPUS_DIR", "/tmp/ocr_sam_ray_corpus")

# bump when generator output changes so stale caches are never read
# v8 = REAL PDF payloads (pdf_build.py) + real image bytes
CORPUS_VERSION = "v9"  # v9 = cross-host footer links (web-graph fixture)

# pages per scale tier (sf names mirror /root/testdata convention); bench
# tiers use body_scale>1 (larger pages) so compute dominates fixed costs
PAGES_PER_SF = {"sf0.001": 240, "sf0.01": 2400, "sf0.1": 72000,
                "sf1": 240000}
BODY_SCALE_PER_SF = {"sf0.001": 1, "sf0.01": 1, "sf0.1": 10, "sf1": 10}
CHECK_STRIDE_PER_SF = {"sf0.001": 1, "sf0.01": 1, "sf0.1": 8, "sf1": 64}


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def corpus_paths(sf_dir: str) -> dict[str, str]:
    name = sf_name(sf_dir)
    base = os.path.join(CACHE_ROOT, CORPUS_VERSION, name)
    return {
        "pages": os.path.join(base, "pages"),  # directory of parquet shards
        "golden_pages": os.path.join(base, "golden_pages.parquet"),
        "golden_segments": os.path.join(base, "golden_segments.parquet"),
        "golden_entities": os.path.join(base, "golden_entities.parquet"),
    }


def ensure_corpus(sf_dir: str, seed: int = 42) -> dict[str, str]:
    """Generate-and-cache the corpus for a scale tier; atomic (tmp+rename),
    idempotent, safe under concurrent callers (bytes are deterministic).
    The ``pages`` table is written as a directory of parquet shards split on
    url boundaries (parallel reads + the resumable runner's shard unit)."""
    paths = corpus_paths(sf_dir)
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    name = sf_name(sf_dir)
    n_pages = PAGES_PER_SF.get(name, 2400)
    pages_t, gp_t, gs_t, ge_t = generate_corpus(
        n_pages,
        seed=seed,
        body_scale=BODY_SCALE_PER_SF.get(name, 1),
        check_stride=CHECK_STRIDE_PER_SF.get(name, 1),
    )
    base = os.path.dirname(paths["golden_pages"])
    os.makedirs(base, exist_ok=True)

    n_files = max(2, n_pages // 300)
    tmp_dir = paths["pages"] + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    for j, (start, end) in enumerate(split_offsets_by_url(pages_t, n_files)):
        pq.write_table(pages_t.slice(start, end - start),
                       os.path.join(tmp_dir, f"part-{j:05d}.parquet"))
    if not os.path.exists(paths["pages"]):
        os.replace(tmp_dir, paths["pages"])
    else:  # concurrent generator won the race; bytes are identical
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)

    for key, table in [("golden_pages", gp_t), ("golden_segments", gs_t),
                       ("golden_entities", ge_t)]:
        tmp = paths[key] + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, paths[key])
    return paths
