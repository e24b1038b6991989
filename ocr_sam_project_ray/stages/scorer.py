"""Deterministic text-analysis scorer stage — the M22 slot.

The reference's complementary text analyzer
(/root/reference/src/services/mistral_service.py:43-273) sends text to a
remote chat API for "legal analysis" / summary / entity extraction. This
engine fills that seam with a DETERMINISTIC actor-pool stage so outputs are
reproducible and offline-testable; a real model scorer drops into the same
class (load the model in ``__init__``, batch-infer in ``__call__``).

Outputs per row:
- ``summary``: first ``summary_chars`` characters of the text (whitespace-
  collapsed), the analog of the API's summary analysis type
- ``risk_keyword_count``: occurrences of the high-priority keyword set
  (crm_integrator/app.py:411-414)
- ``legal_density_ppm``: integer ppm of characters inside legal-pattern
  matches (cedula/ruc/oficio/money/date spans) — a deterministic
  "how legal is this text" score
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..functions.classify import HIGH_PRIORITY_KEYWORDS
from ..functions.extract_core import extract_spans


class TextScorer:
    def __init__(self, summary_chars: int = 160):
        self.summary_chars = summary_chars
        # warm per-actor state: the compiled keyword scanner
        self.kw = re.compile("|".join(re.escape(k) for k in HIGH_PRIORITY_KEYWORDS))

    def score_one(self, text: str) -> tuple[str, int, int]:
        text = text or ""
        # summary: " ".join(s.split()) == re.sub(r"\s+", " ", s).strip() on every
        # string (the html_text.py whitespace-set enumeration), and f(P) is
        # always a PREFIX of f(T) for any prefix P of T (split/join only
        # deletes whitespace and inserts single separators), so collapsing a
        # bounded prefix yields the identical first summary_chars characters;
        # escalate only in the rare whitespace-dense case. Equality with the
        # full-collapse form is pinned in test_scorer_and_skew over corpus
        # texts plus whitespace-dense adversarial cases.
        k = self.summary_chars
        take = 4 * k + 64
        collapsed = " ".join(text[:take].split())
        while len(collapsed) < k and take < len(text):
            take *= 8
            collapsed = " ".join(text[:take].split())
        summary = collapsed[:k]
        risk = len(self.kw.findall(text.lower()))
        # identical match set to six full finditer passes — extract_spans'
        # digit-window fast path is equality-pinned in test_patterns
        covered = sum(s["end"] - s["start"] for s in extract_spans(text))
        density_ppm = int(covered * 1_000_000 / len(text)) if text else 0
        return summary, risk, density_ppm

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["extracted_text"].to_pylist()
        scored = [self.score_one(t) for t in texts]
        return (
            batch.append_column(
                "summary", pa.array([s[0] for s in scored], pa.string())
            )
            .append_column(
                "risk_keyword_count", pa.array([s[1] for s in scored], pa.int64())
            )
            .append_column(
                "legal_density_ppm", pa.array([s[2] for s in scored], pa.int64())
            )
        )


def score_batch(batch: pa.Table) -> pa.Table:
    return TextScorer()(batch)
