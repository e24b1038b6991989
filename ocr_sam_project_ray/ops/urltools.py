"""URL canonicalization + host blocklist filtering — the first thing every
Common-Crawl-scale pipeline does to its `url` column before dedup: two
crawls of the same page must collapse to ONE canonical key, and blocked
domains must leave the corpus before any payload is shipped.

Kernel is pure ``pyarrow.compute`` RE2 (``replace_substring_regex`` /
``count_substring_regex``) — the same regex engine DuckDB uses — so the
SQL oracle recomputes every rule byte-for-byte (the ``ops/pii.py``
pattern).  Rules, in FIXED order (order is part of the contract):

1. strip the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` head (ONLY the head — paths are
   case-sensitive);
3. drop default ports (``http://…:80``, ``https://…:443``);
4. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref_src``) — counted per row as ``n_tracking``;
5. clean up the delimiters the removal leaves behind (``?&`` / ``&&`` /
   trailing ``?``/``&``).

RE2 has no lookaround, so every rule is written with capture groups and
``\\1``-style rewrites that mean the same thing in pyarrow and DuckDB.

Scale notes: stateless vectorized ``map_batches`` over the pruned ``url``
column — zero shuffle, zero per-row Python.  The blocklist is a broadcast
set (``ray.put`` once, ``pc.is_in`` per batch), never a join: blocklists
are thousands of hosts, the corpus is 10^12 rows.

The reference validates URL-shaped document ids but never canonicalizes
(src/shared/validators.py); this op is part of the engine's
beyond-reference web-scale surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

# scheme://host[:port] — everything before the first /, ? or #
_HEAD = r"[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"

_TRACKING = r"utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src"

# (name, pattern, rewrite) applied in order AFTER the lowercase step;
# sql_canonicalize renders the same chain for the oracle.
CANON_RULES: tuple[tuple[str, str, str], ...] = (
    ("default_https_port", r"^(https://[^/?#]*):443([/?#].*)?$", r"\1\2"),
    ("default_http_port", r"^(http://[^/?#]*):80([/?#].*)?$", r"\1\2"),
    ("tracking_params", r"([?&])(?:" + _TRACKING + r")=[^&#]*", r"\1"),
    ("collapse_amp", r"&&+", r"&"),
    ("question_amp", r"\?&", r"?"),
    ("trailing_delims", r"[?&]+$", r""),
)

_FRAGMENT = r"#.*$"
_HOST = r"^[a-z][a-z0-9+.\-]*://([^/?#:]+).*$"


def canonicalize_batch(batch: pa.Table, url_col: str = "url",
                       out_col: str = "canonical_url") -> pa.Table:
    """Vectorized canonicalization over one Arrow batch: appends
    ``out_col``, ``host`` and ``n_tracking`` columns."""
    cur = pc.cast(batch.column(url_col), pa.string())
    # 1. fragment
    cur = pc.replace_substring_regex(cur, pattern=_FRAGMENT, replacement="")
    # 2. lowercase scheme://host[:port]; leave path/query untouched.
    #    Rows without a scheme head pass through unchanged (head == full
    #    string only when the pattern matched; otherwise both replaces
    #    are no-ops and lower() of the unmatched head never splices in).
    head = pc.replace_substring_regex(
        cur, pattern=r"^(" + _HEAD + r").*$", replacement=r"\1")
    tail = pc.replace_substring_regex(cur, pattern=r"^" + _HEAD,
                                      replacement="")
    matched = pc.not_equal(tail, cur)  # head pattern actually matched
    lowered = pc.binary_join_element_wise(pc.utf8_lower(head), tail, "")
    cur = pc.if_else(matched, lowered, cur)
    # 3-5. port / tracking / cleanup rules
    n_tracking = None
    for name, pattern, rewrite in CANON_RULES:
        if name == "tracking_params":
            n_tracking = pc.cast(
                pc.count_substring_regex(cur, pattern=pattern), pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pattern,
                                         replacement=rewrite)
    host = pc.replace_substring_regex(cur, pattern=_HOST, replacement=r"\1")
    out = batch.append_column(out_col, cur)
    out = out.append_column("host", host)
    return out.append_column("n_tracking", n_tracking)


def canonicalize_urls(ds: Dataset, url_col: str = "url",
                      out_col: str = "canonical_url") -> Dataset:
    """Dataset → Dataset with ``out_col`` + ``host`` + ``n_tracking``.
    Stateless task-pool stage."""
    return ds.map_batches(
        lambda b: canonicalize_batch(b, url_col=url_col, out_col=out_col),
        batch_format="pyarrow",
    )


def flag_blocked_hosts(ds: Dataset, blocked_hosts: list[str],
                       host_col: str = "host") -> Dataset:
    """Append a ``blocked`` bool column: host ∈ blocklist.  The blocklist
    is broadcast once (``ray.put``) and probed per batch with ``pc.is_in``
    — never a join."""
    ref = ray.put(pa.array(sorted(set(blocked_hosts)), pa.string()))

    def flag(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        return batch.append_column(
            "blocked", pc.is_in(pc.cast(batch.column(host_col), pa.string()),
                                value_set=bl))

    return ds.map_batches(flag, batch_format="pyarrow")


def filter_blocked_hosts(ds: Dataset, blocked_hosts: list[str],
                         host_col: str = "host") -> Dataset:
    """Drop rows whose host is blocklisted (same broadcast probe)."""
    ref = ray.put(pa.array(sorted(set(blocked_hosts)), pa.string()))

    def keep(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        mask = pc.is_in(pc.cast(batch.column(host_col), pa.string()),
                        value_set=bl)
        return batch.filter(pc.invert(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def _sql_escape(pattern: str) -> str:
    # DuckDB plain '...' literals pass backslashes through untouched —
    # only quotes need escaping (same convention as ops/pii.py).
    return pattern.replace("'", "''")


def sql_canonicalize(expr: str) -> tuple[str, str, str]:
    """Render the full rule chain as DuckDB SQL over ``expr`` → a tuple of
    (canonical_expr, host_expr, n_tracking_expr).  Every regexp uses the
    'g' flag because the Arrow kernel is always-global."""
    cur = f"regexp_replace({expr}, '{_sql_escape(_FRAGMENT)}', '', 'g')"
    head_pat = _sql_escape("^(" + _HEAD + ").*$")
    tail_pat = _sql_escape("^" + _HEAD)
    head = f"lower(regexp_replace({cur}, '{head_pat}', '\\1', 'g'))"
    tail = f"regexp_replace({cur}, '{tail_pat}', '', 'g')"
    cur = (f"CASE WHEN {tail} <> {cur} THEN {head} || {tail} "
           f"ELSE {cur} END")
    n_tracking = None
    for name, pattern, rewrite in CANON_RULES:
        pat_sql = _sql_escape(pattern)
        rew_sql = rewrite
        if name == "tracking_params":
            n_tracking = (f"CAST(len(regexp_extract_all({cur}, "
                          f"'{pat_sql}')) AS BIGINT)")
        cur = f"regexp_replace({cur}, '{pat_sql}', '{rew_sql}', 'g')"
    host = (f"regexp_replace({cur}, '{_sql_escape(_HOST)}', '\\1', 'g')")
    return cur, host, n_tracking
