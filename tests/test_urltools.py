"""URL canonicalization + blocklist: Arrow-kernel/DuckDB parity on
adversarial URLs, rule-order semantics, and the broadcast blocklist
probe through a real Dataset."""

import duckdb
import pyarrow as pa
import pytest

import ray.data

from ocr_sam_project_ray.ops.urltools import (
    canonicalize_batch,
    canonicalize_urls,
    filter_blocked_hosts,
    flag_blocked_hosts,
    sql_canonicalize,
)

ADVERSARIAL = [
    "https://Portal6.Example.PA/Oficios/0000000?utm_source=feed&id=5",
    "HTTPS://HOST.EXAMPLE/Path/File.HTML#frag",
    "https://host.example:443/a?gclid=xyz",
    "http://host.example:80/a?id=1&utm_campaign=x&fbclid=a1#x",
    "https://host.example:8443/a?utm_a=1&utm_b=2&id=5",
    "http://host.example/?utm_only=1",
    "https://host.example",
    "no-scheme/path?utm_source=x",
    "https://host.example/a?ref_src=twsrc&msclkid=9&z=1",
    "ftp://Mixed.Case.Host/File",
    "",
    "https://host.example/a?id=1&id=2",
    "https://host.example/a#frag?utm_source=infragment",
    "https://host.example:443",
    "http://h.example/a?utm_=empty&b=2",
]


def _engine(urls):
    out = canonicalize_batch(pa.table({"url": pa.array(urls, pa.string())}))
    return list(zip(out["canonical_url"].to_pylist(),
                    out["host"].to_pylist(),
                    out["n_tracking"].to_pylist()))


def _oracle(urls):
    canon, host, ntr = sql_canonicalize("url")
    con = duckdb.connect()
    con.register("t", pa.table({"url": pa.array(urls, pa.string())}))
    return con.execute(f"SELECT {canon}, {host}, {ntr} FROM t").fetchall()


def test_parity_with_duckdb_on_adversarial_urls():
    eng = _engine(ADVERSARIAL)
    sql = _oracle(ADVERSARIAL)
    for u, e, s in zip(ADVERSARIAL, eng, sql):
        assert e == tuple(s), f"engine/oracle diverge on {u!r}: {e} vs {s}"


def test_rule_semantics():
    (c, h, n), = _engine(
        ["http://Host.Example:80/A/b?utm_source=x&id=1&fbclid=z#frag"])
    assert c == "http://host.example/A/b?id=1"  # path case preserved
    assert h == "host.example"
    assert n == 2


def test_fragment_stripped_before_tracking_scan():
    # utm inside the fragment must NOT count: fragment rule runs first.
    (c, _h, n), = _engine(["https://host.example/a#frag?utm_source=infrag"])
    assert c == "https://host.example/a"
    assert n == 0


def test_non_default_port_kept():
    (c, _h, _n), = _engine(["https://host.example:8443/x"])
    assert c == "https://host.example:8443/x"


def test_schemeless_passthrough():
    (c, _h, n), = _engine(["relative/path?utm_source=x"])
    assert c == "relative/path"
    assert n == 1


def test_idempotent():
    once = [c for c, _h, _n in _engine(ADVERSARIAL)]
    twice = [c for c, _h, _n in _engine(once)]
    assert once == twice


def test_blocklist_flag_and_filter_dataset():
    urls = [f"https://portal{i}.example.pa/x?utm_source=s" for i in range(8)]
    ds = canonicalize_urls(ray.data.from_arrow(
        pa.table({"url": pa.array(urls, pa.string())})))
    blocked = ["portal3.example.pa", "portal5.example.pa"]
    flagged = flag_blocked_hosts(ds, blocked).to_pandas()
    assert sorted(flagged[flagged.blocked].host) == sorted(blocked)
    kept = filter_blocked_hosts(ds, blocked).to_pandas()
    assert len(kept) == 6
    assert not set(kept.host) & set(blocked)
    assert (kept.n_tracking == 1).all()


@pytest.mark.parametrize("url,host", [
    ("https://a.b.c/d", "a.b.c"),
    ("http://a.b.c:9090/d", "a.b.c"),
    ("https://a.b.c", "a.b.c"),
])
def test_host_extraction(url, host):
    (_c, h, _n), = _engine([url])
    assert h == host
