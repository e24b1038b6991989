import duckdb
import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.mojibake import (
    MOJIBAKE_TABLE, corrupt_chain, repair_chain_array, repair_mojibake,
    repair_roundtrip, sql_mojibake_query,
)

SF = "/root/testdata/sf0.001"


def test_table_shape():
    assert len(MOJIBAKE_TABLE) == 94
    assert ("Ã©", "é") in MOJIBAKE_TABLE
    assert ("Â©", "©") in MOJIBAKE_TABLE
    # leads excluded
    assert all(rep not in ("Â", "Ã") for _, rep in MOJIBAKE_TABLE)


def test_chain_repairs_classic_mojibake():
    arr = pa.array(["CafÃ© MÃ¼nchen", "naÃ¯ve Â«quoteÂ»", "clean ascii",
                    None, ""])
    got = repair_chain_array(arr).to_pylist()
    assert got == ["Café München", "naïve «quote»", "clean ascii", None, ""]


def test_chain_matches_duckdb_twin_on_all_rules():
    # decorate: corrupt every Latin-1-supplement char, repair both sides
    src = ["x " + " ".join(chr(c) for c in range(0xA0, 0x100)), "plain",
           "mixed é ü ß ¿", ""]
    arr = pa.array(src, pa.string())
    eng = repair_chain_array(corrupt_chain(arr)).to_pylist()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT unnest(range(4)) AS doc_id, "
        "unnest(?) AS text", [src]
    )
    df = con.execute(
        sql_mojibake_query(table="docs") + " ORDER BY doc_id"
    ).df()
    assert eng == df["text_fixed"].tolist()
    assert df["changed"].tolist() == [True, False, True, False]


def test_corrupt_then_repair_roundtrips_supplement_chars():
    # chars whose corruption the chain fully inverts (not the leads)
    src = ["résumé ñoño ©2024 ±3°", "ÀÁÈÉÌÍÒÓÙÚ àáèéìíòóùú"]
    arr = pa.array(src, pa.string())
    got = repair_chain_array(corrupt_chain(arr)).to_pylist()
    assert got == src


def test_roundtrip_kernel_general_cases():
    # Latin-1-supplement corruption: agrees with the chain
    s = "Café №? — naïve"
    corrupted = s.encode("utf-8").decode("latin-1")
    assert repair_roundtrip(corrupted) == s
    # CJK + emoji (3/4-byte sequences the digraph table cannot express)
    for s in ["日本語のテキスト", "emoji 🎉 test", "中文 mixed ascii"]:
        corrupted = s.encode("utf-8").decode("latin-1")
        assert repair_roundtrip(corrupted) == s
    # clean text untouched; invalid sequences untouched
    assert repair_roundtrip("plain ascii") == "plain ascii"
    assert repair_roundtrip("Ã without continuation") == \
        "Ã without continuation"
    assert repair_roundtrip(None) is None


def test_repair_mojibake_dataset_marks_changed():
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["CafÃ©", "clean", None], pa.string()),
        }
    )
    out = (
        repair_mojibake(ray.data.from_arrow(tbl))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.text_fixed.tolist()[:2] == ["Café", "clean"]
    assert out.changed.tolist()[:2] == [True, False]
