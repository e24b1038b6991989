"""Real image PIXEL decode → nearest-neighbor resize → BMP re-encode,
as an actor-pool ``map_batches`` stage — the multimodal transform step
of a training-data pipeline (decode/resize before feature extraction),
built stdlib-only because no imaging library ships in this environment.

Unlike the header-only metadata stage (ops/multimodal.py DecodePayload),
this op decodes ACTUAL pixels for the three containers the corpus
builds (ops/imagebytes.py) and any conforming file of the same shapes:

- BMP: uncompressed 24-bpp bottom-up (BI_RGB), the universal baseline;
- PNG: 8-bit grayscale, filter-0 scanlines (zlib inflate + unfilter);
  other color types / filters raise loudly — documented envelope, not
  a silent wrong answer;
- GIF: single-frame, global color table, full general LZW decode
  (variable code width, dictionary growth, clear/EOF codes — handles
  both real-world streams and the corpus's clear-heavy fixed-width
  encoding); interlace / local palettes raise loudly.

Resize contract (mirrored by the SQL oracle and the pytest pixel
checks): nearest neighbor with the floor mapping
``src_x = (x * src_w) // out_w`` (exact integer arithmetic — no float
rounding anywhere), output re-encoded as 24-bpp BMP whose byte size is
the closed form ``54 + ((3*out_w + 3) // 4 * 4) * out_h``, so the
oracle recomputes every metadata column (dims, bytes) from doc_id
alone; pixel CONTENT is pinned by pytest against the generators'
closed-form patterns.

Scale shape: a stateless kernel wrapped in an actor-pool
``map_batches(ResizeImages, batch_size=32, concurrency=(m, n))`` —
blob columns need SMALL batches (batch bytes = batch_size × payload
size × concurrency must fit the worker heap); payloads stay inside the
stage (binary in, binary out, no shuffle ever sees them).

The reference has no image surface (documents only); this module is
part of the engine's beyond-reference multimodal mandate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .multimodal import sniff_format


def _decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row = (3 * w + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_off
    ).reshape(h, row)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR on disk → RGB


def _decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i = 8
    w = h = -1
    idat = bytearray()
    while i + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, i)[0]
        tag = payload[i + 4: i + 8]
        body = payload[i + 8: i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
            if depth != 8 or ctype != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, colortype={ctype}); "
                    "this decoder covers 8-bit grayscale"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w < 0:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w + 1
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(
        h, stride
    )
    if rows[:, 0].any():
        raise ValueError(
            "unsupported PNG scanline filter; this decoder covers filter 0"
        )
    gray = rows[:, 1:]
    return np.repeat(gray[:, :, None], 3, axis=2)


def _gif_lzw(data: bytes, min_code: int, n_px: int) -> np.ndarray:
    """General single-frame GIF LZW decode → palette indices."""
    clear = 1 << min_code
    eof = clear + 1
    out = np.empty(n_px, dtype=np.uint8)
    n_out = 0
    # bit reader, LSB first
    bits = bitpos = pos = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev = b""

    def read_code():
        nonlocal bits, bitpos, pos
        while bitpos < width:
            if pos >= len(data):
                return eof
            bits |= data[pos] << bitpos
            bitpos += 8
            pos += 1
        code = bits & ((1 << width) - 1)
        bits >>= width
        bitpos -= width
        return code

    while n_out < n_px:
        code = read_code()
        if code == eof:
            break
        if code == clear:
            table = table[: clear + 2]
            width = min_code + 1
            prev = b""
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        take = min(len(entry), n_px - n_out)
        out[n_out: n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_px:
        raise ValueError("GIF pixel data truncated")
    return out


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w0, h0 = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    i = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = np.frombuffer(
            payload, np.uint8, count=3 * n, offset=i
        ).reshape(n, 3)
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            _, _, iw, ih = struct.unpack_from("<HHHH", payload, i + 1)
            iflags = payload[i + 9]
            if iflags & 0xC0:
                raise ValueError(
                    "unsupported GIF (local palette / interlace)"
                )
            if palette is None:
                raise ValueError("GIF without a global color table")
            i += 10
            min_code = payload[i]
            i += 1
            data = bytearray()
            while payload[i] != 0:
                ln = payload[i]
                data += payload[i + 1: i + 1 + ln]
                i += 1 + ln
            idx = _gif_lzw(bytes(data), min_code, iw * ih)
            return palette[idx.reshape(ih, iw)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF without an image block")


def decode_pixels(payload: bytes):
    """(h, w, 3) uint8 RGB array, or None for bytes that are not one of
    the three supported containers (text payloads, unknown formats)."""
    fmt = sniff_format(payload)
    try:
        if fmt == "bmp":
            return _decode_bmp(payload)
        if fmt == "png":
            return _decode_png(payload)
        if fmt == "gif":
            return _decode_gif(payload)
    except (ValueError, struct.error, zlib.error, IndexError):
        return None
    return None


def nearest_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest neighbor under the exact-integer floor mapping
    ``src = (dst * src_dim) // out_dim`` — deterministic across
    platforms (no float coordinate arithmetic)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys][:, xs]


def encode_bmp(px: np.ndarray, dpi: int = 72) -> bytes:
    """24-bpp bottom-up BMP of an (h, w, 3) uint8 RGB array — the same
    layout ops/imagebytes.tiny_bmp writes, vectorized."""
    h, w = px.shape[:2]
    row = (3 * w + 3) & ~3
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)  # RGB→BGR, flip
    ppm = round(dpi / 0.0254)
    header = b"BM" + struct.pack("<IHHI", 54 + row * h, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, ppm, ppm, 0, 0
    )
    return header + dib + body.tobytes()


class ResizeImages:
    """Actor-pool resize stage: decode pixels, nearest-resize by the
    exact rational ``num/den`` (floored, floored dims clamped to
    ``min_side``), re-encode as 24-bpp BMP. Rows whose payload is not a
    decodable image pass through with ``decodable=false`` and null
    output payload — per-row error capture, never a dropped row or a
    poisoned batch."""

    def __init__(
        self,
        num: int = 1,
        den: int = 2,
        min_side: int = 1,
        id_col: str = "item_id",
        payload_col: str = "payload",
    ):
        self.num = num
        self.den = den
        self.min_side = min_side
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        fmt_o, sw_o, sh_o, ow_o, oh_o, nb_o, out_o, ok_o = (
            [], [], [], [], [], [], [], []
        )
        for payload in payloads:
            px = decode_pixels(payload) if payload is not None else None
            if px is None:
                fmt_o.append(sniff_format(payload or b""))
                sw_o.append(0); sh_o.append(0)
                ow_o.append(0); oh_o.append(0)
                nb_o.append(0); out_o.append(None); ok_o.append(False)
                continue
            h, w = px.shape[:2]
            ow = max(self.min_side, (w * self.num) // self.den)
            oh = max(self.min_side, (h * self.num) // self.den)
            enc = encode_bmp(nearest_resize(px, ow, oh))
            fmt_o.append(sniff_format(payload))
            sw_o.append(w); sh_o.append(h)
            ow_o.append(ow); oh_o.append(oh)
            nb_o.append(len(enc)); out_o.append(enc); ok_o.append(True)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "format": pa.array(fmt_o, pa.string()),
            "src_w": pa.array(sw_o, pa.int32()),
            "src_h": pa.array(sh_o, pa.int32()),
            "out_w": pa.array(ow_o, pa.int32()),
            "out_h": pa.array(oh_o, pa.int32()),
            "n_bytes": pa.array(nb_o, pa.int64()),
            "payload_out": pa.array(out_o, pa.binary()),
            "decodable": pa.array(ok_o, pa.bool_()),
        })


def resize_payloads(
    ds: Dataset,
    num: int = 1,
    den: int = 2,
    batch_size: int = 32,
    concurrency=(1, 4),
) -> Dataset:
    """Run the resize actor pool with blob-appropriate (small) batches."""
    return ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs={"num": num, "den": den},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageChannelStats:
    """Feature-extraction stage: exact per-channel pixel SUMS (int64,
    reduction-order-free) + pixel count per image — the integer-contract
    form of mean-color features (mean = sum / n_px, derived exactly by
    any consumer). Same per-row error capture as ResizeImages."""

    def __init__(self, id_col: str = "item_id",
                 payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        fmt_o, n_o, r_o, g_o, b_o, ok_o = [], [], [], [], [], []
        for payload in payloads:
            px = decode_pixels(payload) if payload is not None else None
            if px is None:
                fmt_o.append(sniff_format(payload or b""))
                n_o.append(0); r_o.append(0); g_o.append(0); b_o.append(0)
                ok_o.append(False)
                continue
            s = px.astype(np.int64).sum(axis=(0, 1))
            fmt_o.append(sniff_format(payload))
            n_o.append(px.shape[0] * px.shape[1])
            r_o.append(int(s[0])); g_o.append(int(s[1]))
            b_o.append(int(s[2])); ok_o.append(True)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "format": pa.array(fmt_o, pa.string()),
            "n_px": pa.array(n_o, pa.int64()),
            "sum_r": pa.array(r_o, pa.int64()),
            "sum_g": pa.array(g_o, pa.int64()),
            "sum_b": pa.array(b_o, pa.int64()),
            "decodable": pa.array(ok_o, pa.bool_()),
        })


def channel_stats_payloads(
    ds: Dataset, batch_size: int = 32, concurrency=(1, 4)
) -> Dataset:
    """Run the channel-stats actor pool with blob-appropriate batches."""
    return ds.map_batches(
        ImageChannelStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_gif_frames(payload: bytes) -> list:
    """ALL frames of a (possibly animated) GIF as full-size RGB arrays.
    Envelope: every frame must be full-canvas with the global palette
    and no interlace — frame-replace semantics, no disposal compositing
    (raises loudly outside it; the corpus's animations and the common
    full-frame screen-capture shape are inside)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w0, h0 = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    i = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = np.frombuffer(
            payload, np.uint8, count=3 * n, offset=i
        ).reshape(n, 3)
        i += 3 * n
    frames = []
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension (incl. graphic control): skip
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:
            left, top, iw, ih = struct.unpack_from("<HHHH", payload, i + 1)
            iflags = payload[i + 9]
            if iflags & 0xC0:
                raise ValueError(
                    "unsupported GIF (local palette / interlace)"
                )
            if (left, top, iw, ih) != (0, 0, w0, h0):
                raise ValueError(
                    "unsupported GIF (sub-canvas frame; this decoder "
                    "covers full-frame-replace animations)"
                )
            if palette is None:
                raise ValueError("GIF without a global color table")
            i += 10
            min_code = payload[i]
            i += 1
            data = bytearray()
            while payload[i] != 0:
                ln = payload[i]
                data += payload[i + 1: i + 1 + ln]
                i += 1 + ln
            i += 1
            idx = _gif_lzw(bytes(data), min_code, iw * ih)
            frames.append(palette[idx.reshape(ih, iw)])
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF without an image block")
    return frames


class FrameSample:
    """Video/animation frame sampling as a 1→N flat-map stage: decode
    all frames of an animated GIF, keep every ``every``-th one, and emit
    one row per SAMPLED frame with its exact per-channel pixel sums —
    the standard pre-processing step before per-frame feature
    extraction. Non-GIF / undecodable payloads emit one captured row
    (frame_idx = -1, decodable = false); nothing is ever dropped."""

    def __init__(self, every: int = 2, id_col: str = "item_id",
                 payload_col: str = "payload"):
        if every < 1:
            raise ValueError("every must be >= 1")
        self.every = every
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        o_id, o_nf, o_fi, o_w, o_h = [], [], [], [], []
        o_r, o_g, o_b, o_ok = [], [], [], []
        for item_id, payload in zip(ids, payloads):
            frames = None
            if payload is not None and sniff_format(payload) == "gif":
                try:
                    frames = decode_gif_frames(payload)
                except (ValueError, struct.error, IndexError):
                    frames = None
            if frames is None:
                o_id.append(item_id); o_nf.append(0); o_fi.append(-1)
                o_w.append(0); o_h.append(0)
                o_r.append(0); o_g.append(0); o_b.append(0)
                o_ok.append(False)
                continue
            for fi in range(0, len(frames), self.every):
                px = frames[fi]
                s = px.astype(np.int64).sum(axis=(0, 1))
                o_id.append(item_id); o_nf.append(len(frames))
                o_fi.append(fi)
                o_h.append(px.shape[0]); o_w.append(px.shape[1])
                o_r.append(int(s[0])); o_g.append(int(s[1]))
                o_b.append(int(s[2])); o_ok.append(True)
        return pa.table({
            self.id_col: pa.array(o_id, pa.int64()),
            "n_frames": pa.array(o_nf, pa.int32()),
            "frame_idx": pa.array(o_fi, pa.int32()),
            "w": pa.array(o_w, pa.int32()),
            "h": pa.array(o_h, pa.int32()),
            "sum_r": pa.array(o_r, pa.int64()),
            "sum_g": pa.array(o_g, pa.int64()),
            "sum_b": pa.array(o_b, pa.int64()),
            "decodable": pa.array(o_ok, pa.bool_()),
        })


def frame_sample_payloads(
    ds: Dataset, every: int = 2, batch_size: int = 32, concurrency=(1, 4)
) -> Dataset:
    """Run the frame-sampling actor pool with blob-appropriate batches."""
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def anim_payloads_from_documents(docs: Dataset) -> Dataset:
    """Animated-GIF fixture derived from the documents table: every doc
    carries a REAL multi-frame GIF (ops/imagebytes.tiny_gif_anim) with
    closed-form dims (the multimodal fixture formulas) and
    ``n_frames = 1 + doc_id % 4`` — every output of the frame-sampling
    stage is a pure function of doc_id that DuckDB recomputes."""
    from .imagebytes import tiny_gif_anim
    from .multimodal import fixture_dims

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = []
        for did in ids:
            w, h = fixture_dims(did)
            # unpadded: a 4-frame GIF at max fixture dims exceeds the
            # 2 KB pad budget, and no oracle column depends on n_bytes
            payloads.append(tiny_gif_anim(w, h, 1 + did % 4))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })

    return docs.select_columns(["doc_id"]).map_batches(
        f, batch_format="pyarrow"
    )


def dhash_bits(px: np.ndarray) -> tuple[int, int]:
    """64-bit difference hash (dHash — the standard perceptual
    fingerprint for near-duplicate image detection): sample the image to
    a 9x8 grid with the exact-integer nearest mapping, reduce each cell
    to its CHANNEL SUM (monotone-equivalent to the mean, no division),
    set bit j = y*8 + x iff cell (x, y) is strictly brighter than its
    right neighbor. Returned as (hi, lo) int32-range halves so the
    value survives every int64/SQL bridge sign-free."""
    g = px.astype(np.int64).sum(axis=2)
    grid = nearest_resize(g[:, :, None], 9, 8)[:, :, 0]
    bits = (grid[:, :8] > grid[:, 1:]).astype(np.int64)  # (8 rows, 8 cols)
    j = (np.arange(8)[:, None] * 8 + np.arange(8)[None, :])
    lo = int((bits * np.where(j < 32, 1 << (j % 32), 0)).sum())
    hi = int((bits * np.where(j >= 32, 1 << (j % 32), 0)).sum())
    return hi, lo


class ImageDHash:
    """Perceptual-fingerprint stage: dHash per decodable image — the
    image-side analog of the text fingerprint family (ops/winnow.py,
    doc_fingerprint): group by (dhash_hi, dhash_lo) downstream for exact
    perceptual dedup, or Hamming-band the halves for near-dup blocking."""

    def __init__(self, id_col: str = "item_id",
                 payload_col: str = "payload"):
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        fmt_o, hi_o, lo_o, ok_o = [], [], [], []
        for payload in payloads:
            px = decode_pixels(payload) if payload is not None else None
            if px is None:
                fmt_o.append(sniff_format(payload or b""))
                hi_o.append(0); lo_o.append(0); ok_o.append(False)
                continue
            hi, lo = dhash_bits(px)
            fmt_o.append(sniff_format(payload))
            hi_o.append(hi); lo_o.append(lo); ok_o.append(True)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "format": pa.array(fmt_o, pa.string()),
            "dhash_hi": pa.array(hi_o, pa.int64()),
            "dhash_lo": pa.array(lo_o, pa.int64()),
            "decodable": pa.array(ok_o, pa.bool_()),
        })


def dhash_payloads(
    ds: Dataset, batch_size: int = 32, concurrency=(1, 4)
) -> Dataset:
    """Run the dHash actor pool with blob-appropriate batches."""
    return ds.map_batches(
        ImageDHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
