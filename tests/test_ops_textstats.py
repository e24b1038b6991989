import pyarrow as pa

import ray.data

from ocr_sam_project_ray.ops.multimodal import decode_payloads, payloads_from_documents
from ocr_sam_project_ray.ops.textstats import (
    fingerprint_md5, lang_id, quality_row, rolling_fingerprint, textstats_batch,
    tokenize,
)

SF = "/root/testdata/sf0.001"


def test_tokenize():
    assert tokenize("  a  b\tc ") == ["a", "b", "c"]
    assert tokenize("") == []
    assert tokenize("   ") == []


def test_lang_id():
    assert lang_id("the cat and the dog of the house") == "en"
    assert lang_id("el perro y la casa de un amigo que se fue") == "es"
    assert lang_id("der hund und die katze von dem haus") == "de"
    assert lang_id("xyzzy plugh") == "und"
    assert lang_id("") == "und"


def test_quality_row():
    q = quality_row("uno dos tres")
    assert q["n_tokens"] == 3 and q["sum_token_len"] == 10
    assert q["passes_quality"] is False  # < 10 tokens
    long = " ".join(["palabra"] * 12)
    assert quality_row(long)["passes_quality"] is True
    assert quality_row("")["n_tokens"] == 0


def test_fingerprints():
    assert fingerprint_md5("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert rolling_fingerprint("same text here") == rolling_fingerprint("same text here")
    assert rolling_fingerprint("text a") != rolling_fingerprint("text b")
    assert rolling_fingerprint("") == 0
    # near-identical long texts share the same winnowed min-hash often, but
    # determinism is the contract, not collision behavior
    assert isinstance(rolling_fingerprint("x" * 100), int)


def test_textstats_batch_over_documents():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = ds.map_batches(textstats_batch, batch_format="pyarrow").to_pandas()
    assert len(out) == 500
    assert (out.n_tokens > 0).all()
    assert set(out.lang_pred) <= {"de", "en", "es", "fr", "und"}
    assert out.fingerprint.str.len().eq(32).all()


def test_multimodal_decode_plumbing():
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = decode_payloads(payloads_from_documents(docs)).to_pandas()
    assert len(out) == 500
    assert "payload" not in out.columns  # blobs dropped after decode
    # doc_id%5 in (0,1,2) rows are REAL images → real header backends;
    # text rows fall to the labeled stub (no Pillow in container)
    k = out.item_id % 5
    assert (out.decode_backend[k == 0] == "png-header").all()
    assert (out.decode_backend[k == 1] == "gif-header").all()
    assert (out.decode_backend[k == 2] == "bmp-header").all()
    assert (out.decode_backend[k > 2] == "stub").all()
    img = out[k <= 2]
    assert (img.n_bytes == 2048).all()
    assert (img.width == 2 + img.item_id % 31).all()
    assert (img.height == 2 + img.item_id % 17).all()
    assert (img.orientation == 1).all()
    assert (out.n_bytes > 0).all()
    assert out.orientation.between(1, 8).all()
    assert set(out.dpi) <= {72, 144, 216, 288}
    # deterministic across runs
    out2 = decode_payloads(payloads_from_documents(docs)).to_pandas()
    a = out.sort_values("item_id").reset_index(drop=True)
    b = out2.sort_values("item_id").reset_index(drop=True)
    assert a.equals(b)


def test_image_header_decode_roundtrip():
    """build → header-decode inverse over a dimension/density grid, plus
    hostile-byte rejection (text can never take the header path)."""
    from ocr_sam_project_ray.ops.imagebytes import (
        IMG_BYTES, pad_payload, tiny_bmp, tiny_gif, tiny_png,
    )
    from ocr_sam_project_ray.ops.multimodal import decode_image_header

    for w in (1, 2, 7, 31, 32):
        for h in (1, 3, 17, 18):
            for dpi in (72, 144, 216, 288):
                assert decode_image_header(tiny_png(w, h, dpi)) == \
                    (w, h, dpi, "png-header")
                assert decode_image_header(tiny_bmp(w, h, dpi)) == \
                    (w, h, dpi, "bmp-header")
            assert decode_image_header(tiny_gif(w, h)) == \
                (w, h, 72, "gif-header")
            # padding must not perturb the parse
            assert decode_image_header(pad_payload(tiny_gif(w, h))) == \
                (w, h, 72, "gif-header")
    assert len(pad_payload(tiny_bmp(32, 18, 288))) == IMG_BYTES
    # JPEG SOF scan on a hand-crafted minimal frame header
    jpeg = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
            b"\xff\xc0\x00\x11\x08\x01\x40\x00\xf0\x03\x01\x22\x00\x02\x11"
            b"\x01\x03\x11\x01")
    assert decode_image_header(jpeg) == (240, 320, 72, "jpeg-sof")
    # hostile / text payloads → None (stub path)
    for bad in (b"", b"plain text", "GIF89aXXXXXXXXXX".encode(),
                b"BM" + b"A" * 60, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4):
        assert decode_image_header(bad) is None


def test_format_sniffing_magic_bytes():
    """Real container sniffing on hand-crafted magic-byte payloads."""
    from ocr_sam_project_ray.ops.multimodal import sniff_format

    assert sniff_format(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16) == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0" + b"\x00" * 16) == "jpeg"
    assert sniff_format(b"GIF89a" + b"\x00" * 10) == "gif"
    assert sniff_format(b"GIF87a") == "gif"
    assert sniff_format(b"BM" + b"\x00" * 20) == "bmp"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVE") == "unknown"
    assert sniff_format(b"plain text payload") == "unknown"
    assert sniff_format(b"") == "unknown"


def test_flat_tokens_parity_adversarial():
    """flat_tokens == [tokenize(t) for t in col] flattened, on the nasty
    cases: nulls, empties, whitespace-only, exotic Unicode whitespace
    (\\x1c-\\x1f file separators, NEL, NBSP, line/para separators,
    ideographic space), leading/trailing runs, and high-plane text."""
    import numpy as np

    from ocr_sam_project_ray.ops.textstats import flat_tokens

    texts = [
        "  a  b\tc ", "", None, "   ", "\x1ca\x1db\x1ec\x1fd",
        "a\x85b\xa0c", "x y z", "w　v", " q ",
        "😀 𝔘𝔫𝔦 \U0010FFFDtail", "one", " lead", "trail ", "\n\n\n",
        "a" * 500 + " " + "b" * 500,
    ]
    col = pa.array(texts)
    dl, flat, doc_idx = flat_tokens(col)
    exp = [tokenize(t) for t in texts]
    assert dl.tolist() == [len(e) for e in exp]
    assert flat.to_pylist() == [t for e in exp for t in e]
    assert doc_idx.tolist() == [i for i, e in enumerate(exp) for _ in e]
    # chunked input takes the combine_chunks path
    ch = pa.chunked_array([texts[:5], texts[5:]], type=pa.string())
    dl2, flat2, di2 = flat_tokens(ch)
    assert dl2.tolist() == dl.tolist() and flat2.to_pylist() == flat.to_pylist()
    assert di2.tolist() == doc_idx.tolist()
    # all-clean fast path (no boundary empties anywhere)
    clean = pa.array(["a b", "c", "d e f"])
    dl3, flat3, di3 = flat_tokens(clean)
    assert dl3.tolist() == [2, 1, 3]
    assert flat3.to_pylist() == ["a", "b", "c", "d", "e", "f"]
    assert di3.tolist() == [0, 0, 1, 2, 2, 2]


def test_flat_tokens_whitespace_set_equals_python():
    """Re-enumerate the parity argument: Arrow's Unicode whitespace set
    equals Python re \\s over the range containing every Unicode
    whitespace scalar (all are < 0x3100), plus a high-plane sample.
    Full-space enumeration (done offline) found ZERO divergence in
    either direction; this pins the claim against pyarrow upgrades."""
    import re as _re

    import pyarrow.compute as pc

    cps = list(range(0x3100)) + [0xFEFF, 0x1680, 0x10000, 0x1F600, 0x10FFFD]
    cps = [c for c in cps if not (0xD800 <= c <= 0xDFFF)]
    arr = pa.array(["a" + chr(c) + "b" for c in cps])
    lens = pc.list_value_length(pc.utf8_split_whitespace(arr)).to_pylist()
    ws = _re.compile(r"\s")
    for c, n in zip(cps, lens):
        assert (n == 2) == bool(ws.match(chr(c))), hex(c)


def test_token_lff_parity_adversarial():
    """token_lff == (len(t), ord(t[0]), ord(t[-1])) per token on 1-4 byte
    UTF-8 widths, single chars, and a huge token (the O(bytes) path that
    replaced the padded U-view)."""
    from ocr_sam_project_ray.ops.textstats import flat_tokens, token_lff

    texts = [
        "a héllo \U0001F600x x\U0001F600 中文字 "
        "\U0001D518ni \U0010FFFD q",
        "Ω", "\x7fend",
        "a" * 70000 + "\U0001D56B", "\U0001D56B" + "b" * 70000,
    ]
    col = pa.array(texts)
    _dl, flat, _di = flat_tokens(col)
    lens, first, last = token_lff(flat)
    toks = [t for x in texts for t in tokenize(x)]
    assert lens.tolist() == [len(t) for t in toks]
    assert first.tolist() == [ord(t[0]) for t in toks]
    assert last.tolist() == [ord(t[-1]) for t in toks]
    # sliced / offset array path
    sl = flat.slice(2, 5)
    l2, f2, la2 = token_lff(sl)
    assert l2.tolist() == lens[2:7].tolist()
    assert f2.tolist() == first[2:7].tolist()
    assert la2.tolist() == last[2:7].tolist()
