import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.pii import PII_RULES, redact_batch, redact_pii, sql_rules


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_redact_batch_basic():
    out = redact_batch(_tbl([
        "cedula 6-603-1979 tel 555-1234 mail a.b@x.com",
        "sin pii",
        None,
    ]))
    assert out.column("redacted_text").to_pylist() == [
        "cedula <ID> tel <PHONE> mail <EMAIL>", "sin pii", None,
    ]
    assert out.column("n_ids").to_pylist() == [1, 0, None]
    assert out.column("n_phones").to_pylist() == [1, 0, None]
    assert out.column("n_emails").to_pylist() == [1, 0, None]


def test_rule_order_prevents_double_fire():
    # the phone-shaped tail of a cedula must NOT fire after <ID> redaction,
    # and the phone count is taken on the post-ID text (0 here)
    out = redact_batch(_tbl(["id 6-603-1979 fin"]))
    assert out.column("redacted_text").to_pylist() == ["id <ID> fin"]
    assert out.column("n_ids").to_pylist() == [1]
    assert out.column("n_phones").to_pylist() == [0]


def test_sql_rules_parity_with_engine():
    texts = [
        "cedula 8-123-4567 y ruc tel 555-0000",
        "correo juan_p+x@mail.example.org aqui",
        "numeros sueltos 12345 1-2-3",
        "",
        "dos ids 1-23-456 y 12-3456-7 tel 123-4567",
    ]
    eng = redact_batch(_tbl(texts))
    expr, counts = sql_rules("text")
    con = duckdb.connect()
    con.register("t", _tbl(texts))
    sql = (
        f"SELECT {expr} AS redacted_text, "
        + ", ".join(f"{e} AS {c}" for c, e in counts.items())
        + " FROM t"
    )
    got = con.execute(sql).arrow()
    assert got.column("redacted_text").to_pylist() == eng.column("redacted_text").to_pylist()
    for name, _, _ in PII_RULES:
        col = f"n_{name}"
        assert got.column(col).to_pylist() == eng.column(col).to_pylist(), col


def test_redact_pii_dataset(ray_session):
    ds = ray.data.from_arrow(_tbl(["a 6-603-1979 b", "x 555-1234 y"]))
    out = redact_pii(ds).to_pandas()
    assert out["redacted_text"].tolist() == ["a <ID> b", "x <PHONE> y"]
    assert out["n_ids"].tolist() == [1, 0]
