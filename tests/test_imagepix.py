"""Real pixel decode / resize / re-encode (ops/imagepix.py): content
pinned against the generators' closed-form patterns, resize mapping
pinned against the exact-integer floor contract, stage + oracle shapes
driven end-to-end over the payloads fixture."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_sam_project_ray.ops.imagebytes import (
    pad_payload, tiny_bmp, tiny_gif, tiny_png,
)
from ocr_sam_project_ray.ops.imagepix import (
    ResizeImages, _decode_bmp, decode_pixels, encode_bmp, nearest_resize,
)


def _bmp_expected(w, h):
    """tiny_bmp writes formula rows in STORAGE order; bottom-up BMP
    means a conforming reader sees them vertically flipped, BGR→RGB."""
    exp = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(3):
                exp[h - 1 - y, x, 2 - c] = (x * 13 + y * 7 + c * 3) % 256
    return exp


@pytest.mark.parametrize("w,h", [(2, 2), (13, 9), (32, 18)])
def test_bmp_pixels_match_generator(w, h):
    px = decode_pixels(pad_payload(tiny_bmp(w, h, 144)))
    assert px.shape == (h, w, 3)
    assert (px == _bmp_expected(w, h)).all()


@pytest.mark.parametrize("w,h", [(2, 2), (13, 9), (31, 17)])
def test_png_pixels_match_generator(w, h):
    px = decode_pixels(pad_payload(tiny_png(w, h, 216)))
    gray = np.array(
        [[(x * 31 + y * 17) % 251 for x in range(w)] for y in range(h)],
        np.uint8,
    )
    assert (px == np.repeat(gray[:, :, None], 3, 2)).all()


@pytest.mark.parametrize("w,h", [(2, 2), (13, 9), (20, 11)])
def test_gif_pixels_match_generator(w, h):
    """Full general LZW decode recovers the 2-color pattern (palette:
    index 0 black, index 1 white; index(i) = (i*7) % 2 row-major)."""
    px = decode_pixels(pad_payload(tiny_gif(w, h)))
    idx = np.fromiter(
        ((i * 7) % 2 for i in range(w * h)), np.uint8, count=w * h
    ).reshape(h, w)
    exp = np.where(idx[:, :, None] == 1, 255, 0).astype(np.uint8)
    assert (px == exp).all()


def test_nearest_resize_floor_mapping():
    """out[y, x] == src[(y*src_h)//out_h, (x*src_w)//out_w] — exact."""
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    out = nearest_resize(src, 5, 4)
    for y in range(4):
        for x in range(5):
            assert (out[y, x] == src[(y * 9) // 4, (x * 13) // 5]).all()
    # upscale works under the same mapping
    up = nearest_resize(src, 26, 18)
    assert (up[::2, ::2] == src).all()


def test_encode_bmp_roundtrip_and_size():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(7, 10, 3), dtype=np.uint8)
    enc = encode_bmp(px)
    assert len(enc) == 54 + ((3 * 10 + 3) // 4 * 4) * 7
    assert (_decode_bmp(enc) == px).all()


def test_decode_pixels_rejects_non_images():
    assert decode_pixels(b"just some text bytes here") is None
    assert decode_pixels(b"") is None
    # truncated PNG: header sniffs but decode fails -> None, not raise
    assert decode_pixels(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_resize_stage_batch_contract():
    """The stage kernel: per-row error capture (text rows pass through
    decodable=false), halved dims clamped at 1, BMP output re-decodable."""
    stage = ResizeImages(num=1, den=2)
    batch = pa.table({
        "item_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [pad_payload(tiny_bmp(13, 9, 72)), b"not an image",
             pad_payload(tiny_png(2, 2, 72))],
            pa.binary(),
        ),
    })
    out = stage(batch)
    assert out["decodable"].to_pylist() == [True, False, True]
    assert out["src_w"].to_pylist() == [13, 0, 2]
    assert out["out_w"].to_pylist() == [6, 0, 1]
    assert out["out_h"].to_pylist() == [4, 0, 1]
    nb = out["n_bytes"].to_pylist()
    assert nb[0] == 54 + ((3 * 6 + 3) // 4 * 4) * 4
    assert nb[1] == 0
    # output payload is itself a decodable BMP with the resized content
    resized = decode_pixels(out["payload_out"][0].as_py())
    assert (resized == nearest_resize(_bmp_expected(13, 9), 6, 4)).all()


def test_resize_payloads_end_to_end(ray_session):
    """Actor-pool stage over the payloads fixture: every image row
    (doc_id % 5 in {0,1,2}) decodes and resizes; every text row is
    captured, none dropped."""
    import ray.data

    from ocr_sam_project_ray.ops.imagepix import resize_payloads
    from ocr_sam_project_ray.ops.multimodal import payloads_from_documents

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    ).limit(50)
    out = resize_payloads(payloads_from_documents(docs)).to_pandas()
    assert len(out) == 50
    img = out[out.item_id % 5 < 3]
    txt = out[out.item_id % 5 >= 3]
    assert img.decodable.all() and not txt.decodable.any()
    assert (img.src_w == 2 + img.item_id % 31).all()
    assert (img.src_h == 2 + img.item_id % 17).all()
    assert (img.out_w == np.maximum(1, img.src_w // 2)).all()
    row = ((3 * img.out_w + 3) // 4 * 4)
    assert (img.n_bytes == 54 + row * img.out_h).all()


def test_channel_stats_match_numpy():
    """Exact per-channel sums equal brute-force numpy sums for all three
    formats; text rows captured with decodable=false."""
    from ocr_sam_project_ray.ops.imagepix import ImageChannelStats

    stage = ImageChannelStats()
    payloads = [
        pad_payload(tiny_bmp(13, 9, 72)),
        pad_payload(tiny_png(7, 5, 72)),
        pad_payload(tiny_gif(6, 4)),
        b"plain text",
    ]
    out = stage(pa.table({
        "item_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }))
    assert out["decodable"].to_pylist() == [True, True, True, False]
    for i in range(3):
        px = decode_pixels(payloads[i]).astype(np.int64)
        assert out["n_px"][i].as_py() == px.shape[0] * px.shape[1]
        s = px.sum(axis=(0, 1))
        assert out["sum_r"][i].as_py() == s[0]
        assert out["sum_g"][i].as_py() == s[1]
        assert out["sum_b"][i].as_py() == s[2]
    assert out["n_px"][3].as_py() == 0


def test_channel_stats_end_to_end(ray_session):
    from ocr_sam_project_ray.ops.imagepix import channel_stats_payloads
    from ocr_sam_project_ray.ops.multimodal import payloads_from_documents

    import ray.data

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    ).limit(40)
    out = channel_stats_payloads(payloads_from_documents(docs)).to_pandas()
    img = out[out.decodable]
    assert (img.item_id % 5 < 3).all()
    assert (img.n_px == (2 + img.item_id % 31) * (2 + img.item_id % 17)).all()
    # gif: sum = 255 * number of odd pixel indices = 255 * (n_px // 2)
    gif = img[img.format == "gif"]
    assert (gif.sum_r == 255 * (gif.n_px // 2)).all()


def test_gif_anim_frames_match_generator():
    """Multi-frame decode: every frame of tiny_gif_anim recovered with
    the per-frame pattern (white iff i % (f+2) == 0) and the closed-form
    white count (w*h + f + 1) // (f + 2)."""
    from ocr_sam_project_ray.ops.imagebytes import tiny_gif_anim
    from ocr_sam_project_ray.ops.imagepix import decode_gif_frames

    for w, h, nf in [(5, 4, 1), (6, 3, 4), (13, 9, 3)]:
        frames = decode_gif_frames(tiny_gif_anim(w, h, nf))
        assert len(frames) == nf
        for f, px in enumerate(frames):
            idx = np.fromiter(
                (1 if i % (f + 2) == 0 else 0 for i in range(w * h)),
                np.uint8, count=w * h,
            ).reshape(h, w)
            exp = np.where(idx[:, :, None] == 1, 255, 0).astype(np.uint8)
            assert (px == exp).all()
            assert int(px[:, :, 0].astype(np.int64).sum()) == 255 * (
                (w * h + f + 1) // (f + 2)
            )


def test_frame_sample_stage_contract():
    """every=2 keeps frames 0, 2, ...; non-GIF rows captured with
    frame_idx=-1; single-frame GIFs emit exactly frame 0."""
    from ocr_sam_project_ray.ops.imagebytes import tiny_gif_anim
    from ocr_sam_project_ray.ops.imagepix import FrameSample

    stage = FrameSample(every=2)
    out = stage(pa.table({
        "item_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array(
            [tiny_gif_anim(4, 3, 4), b"not a gif", tiny_gif_anim(5, 2, 1)],
            pa.binary(),
        ),
    }))
    rows = list(zip(out["item_id"].to_pylist(), out["frame_idx"].to_pylist(),
                    out["n_frames"].to_pylist(), out["decodable"].to_pylist()))
    assert rows == [(1, 0, 4, True), (1, 2, 4, True),
                    (2, -1, 0, False), (3, 0, 1, True)]
    # sampled frame 2 of item 1: white count (12 + 3) // 4 = 3
    assert out["sum_r"][1].as_py() == 255 * 3


def test_frame_sample_end_to_end(ray_session):
    import ray.data

    from ocr_sam_project_ray.ops.imagepix import (
        anim_payloads_from_documents, frame_sample_payloads,
    )

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).limit(30)
    out = frame_sample_payloads(
        anim_payloads_from_documents(docs), every=2
    ).to_pandas()
    assert out.decodable.all()
    assert (out.n_frames == 1 + out.item_id % 4).all()
    assert (out.frame_idx % 2 == 0).all()
    wh = (2 + out.item_id % 31) * (2 + out.item_id % 17)
    assert (out.sum_g == 255 * ((wh + out.frame_idx + 1)
                                // (out.frame_idx + 2))).all()


def test_dhash_bits_properties():
    """dHash: identical images collide; a brightness-structure change
    flips bits; halves stay in int32 range (sign-safe across bridges)."""
    from ocr_sam_project_ray.ops.imagepix import dhash_bits

    a = decode_pixels(pad_payload(tiny_bmp(13, 9, 72)))
    assert dhash_bits(a) == dhash_bits(a.copy())
    hi, lo = dhash_bits(a)
    assert 0 <= hi < 2 ** 32 and 0 <= lo < 2 ** 32
    # flat image -> no strict gradients -> zero hash
    flat = np.full((8, 9, 3), 77, np.uint8)
    assert dhash_bits(flat) == (0, 0)
    # strictly increasing brightness left->right -> all comparisons
    # false (right neighbor brighter) -> zero; reversed -> all 64 bits
    ramp = np.repeat(
        np.arange(9, dtype=np.uint8)[None, :, None] * 20, 8, axis=0
    ).repeat(3, axis=2)
    assert dhash_bits(ramp) == (0, 0)
    assert dhash_bits(ramp[:, ::-1]) == (2 ** 32 - 1, 2 ** 32 - 1)


def test_dhash_stage_end_to_end(ray_session):
    import ray.data

    from ocr_sam_project_ray.ops.imagepix import dhash_bits, dhash_payloads
    from ocr_sam_project_ray.ops.multimodal import payloads_from_documents

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    ).limit(40)
    out = dhash_payloads(payloads_from_documents(docs)).to_pandas()
    img = out[out.decodable]
    assert (img.item_id % 5 < 3).all()
    # spot-check one row against a direct kernel call
    row = img.iloc[0]
    did = int(row.item_id)
    w, h = 2 + did % 31, 2 + did % 17
    k = did % 5
    payload = pad_payload(
        tiny_png(w, h, 72) if k == 0
        else tiny_gif(w, h) if k == 1 else tiny_bmp(w, h, 72)
    )
    assert (row.dhash_hi, row.dhash_lo) == dhash_bits(
        decode_pixels(payload)
    )
