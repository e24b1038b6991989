"""Multimodal binary-column plumbing: opaque ``binary`` payload columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernel is REAL for the container formats whose dimensions live
in fixed headers — PNG (IHDR + pHYs density), GIF (logical screen
descriptor), BMP (BITMAPINFOHEADER incl. pixels-per-meter) and JPEG (SOF
marker scan) — all parsed with stdlib ``struct``, no imaging library
needed. ``DecodePayload`` tries Pillow at actor init (absent in this
container), then the header decoder, and only falls back to the
clearly-marked deterministic digest stub for payloads no parser accepts;
the per-row ``decode_backend`` column reports which kernel produced each
row's dimensions.

Header-decode gating is strict by construction: PNG/JPEG magics start with
non-UTF-8 lead bytes, and the GIF/BMP validations require NUL bytes at
fixed header offsets — so a TEXT payload can never take the header path,
which is what lets the SQL oracle mirror the routing exactly.

Batch-size guidance (SURVEY.md §4 memory row): payload batches should be
sized in BYTES, not rows — callers pass ``batch_size`` so that
``batch_size × max_payload × concurrency`` fits the worker heap.
"""

from __future__ import annotations

import hashlib
import struct

import pyarrow as pa

from ray.data import Dataset

PAYLOAD_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
    ]
)


def sniff_format(payload: bytes) -> str:
    """Container-format sniffing from magic bytes — REAL (no decode lib
    needed) and the first thing any production media pipeline does before
    routing payloads to per-format decoders. Mirrored exactly by the SQL
    oracle for ASCII-representable magics (utf-8 text payloads can never
    start with the PNG/JPEG byte magics — 0x89/0xFF are not valid utf-8
    lead bytes — so the oracle's CASE is exact)."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith(b"BM"):
        return "bmp"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return "unknown"


_INCH_PER_METER = 0.0254


def decode_image_header(payload: bytes):
    """Fixed-header dimension/density decode — returns
    ``(width, height, dpi, backend)`` or ``None`` when the payload is not a
    structurally-valid instance of a supported container.

    PNG: IHDR width/height (big-endian u32) + optional pHYs density chunk.
    GIF: logical-screen-descriptor width/height (little-endian u16);
         requires the spec's aspect-ratio byte to be 0 (NUL — true of
         virtually all real GIFs, impossible for UTF-8 text payloads).
    BMP: BITMAPINFOHEADER (DIB size must be 40; its u32 encoding contains
         NULs) width/|height| + pixels-per-meter density.
    JPEG: marker scan to the first SOF0-SOF15 frame header.
    """
    p = payload
    fmt = sniff_format(p)
    if fmt == "png" and len(p) >= 33 and p[12:16] == b"IHDR":
        w, h = struct.unpack(">II", p[16:24])
        if 0 < w < 1 << 24 and 0 < h < 1 << 24:
            dpi = 72
            i = 8
            while i + 8 <= len(p):  # chunk walk for pHYs (stops at IDAT)
                ln, tag = struct.unpack(">I4s", p[i : i + 8])
                if tag == b"pHYs" and i + 8 + 9 <= len(p):
                    ppux, _ppuy, unit = struct.unpack(
                        ">IIB", p[i + 8 : i + 17]
                    )
                    if unit == 1 and ppux:
                        dpi = round(ppux * _INCH_PER_METER)
                if tag in (b"IDAT", b"IEND"):
                    break
                i += 12 + ln
            return w, h, dpi, "png-header"
    if fmt == "gif" and len(p) >= 13 and p[12] == 0:
        w, h = struct.unpack("<HH", p[6:10])
        if w and h:
            return w, h, 72, "gif-header"
    if fmt == "bmp" and len(p) >= 54 \
            and struct.unpack("<I", p[14:18])[0] == 40:
        w, h = struct.unpack("<ii", p[18:26])
        if w > 0 and h != 0:
            ppm = struct.unpack("<i", p[38:42])[0]
            dpi = round(ppm * _INCH_PER_METER) if ppm > 0 else 72
            return w, abs(h), dpi, "bmp-header"
    if fmt == "jpeg":
        i = 2
        while i + 9 <= len(p) and p[i] == 0xFF:
            marker, seglen = p[i + 1], struct.unpack(">H", p[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                if w and h:
                    return w, h, 72, "jpeg-sof"
                return None
            i += 2 + seglen
    return None


class DecodePayload:
    """Actor-pool stage: (item_id, media_type, payload) → typed metadata +
    a feature digest. Real decoder when available, deterministic stub else.
    Output is production-shaped: container format (real sniffing), pixel
    dimensions, EXIF-like orientation (1-8) and dpi — stub values derived
    from the payload digest so the whole schema is exercised end to end."""

    def __init__(self) -> None:
        try:  # pragma: no cover - Pillow absent in this container
            from PIL import Image

            self._Image = Image
        except ImportError:
            self._Image = None

    def _decode_stub(self, payload: bytes) -> tuple[int, int, str]:
        # DETERMINISTIC FAKE: dimensions derived from the payload digest.
        # NOT a real decode — replace with the real kernel in production.
        d = hashlib.md5(payload).digest()
        return 64 + d[0] % 192, 64 + d[1] % 192, "stub"

    @staticmethod
    def exif_stub(payload: bytes) -> tuple[int, int]:
        """EXIF-like (orientation, dpi) — digest-derived stub, recomputed
        exactly by the SQL oracle (bytes 2-3 of the md5 digest)."""
        d = hashlib.md5(payload).digest()
        return 1 + d[2] % 8, 72 + (d[3] % 4) * 72

    def _decode(self, payload: bytes) -> tuple[int, int, int, int, str]:
        """(width, height, orientation, dpi, backend). Pillow when present,
        else the real stdlib header decoder, else the deterministic stub —
        ``decode_backend`` reports which kernel actually produced the row
        (never claims a real backend for a stubbed row). Header-decoded
        payloads carry no EXIF, so orientation is the spec default 1 and
        dpi comes from the container's density fields (72 when absent)."""
        if self._Image is not None:  # pragma: no cover - Pillow absent here
            import io

            try:
                with self._Image.open(io.BytesIO(payload)) as im:
                    return int(im.width), int(im.height), 1, 72, "pillow"
            except Exception:
                pass  # not a decodable image → header parse / stub below
        hdr = decode_image_header(payload)
        if hdr is not None:
            w, h, dpi, backend = hdr
            return w, h, 1, dpi, backend
        w, h, backend = self._decode_stub(payload)
        o, dpi = self.exif_stub(payload)
        return w, h, o, dpi, backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes, digests, widths, heights, backends = [], [], [], [], []
        formats, orientations, dpis = [], [], []
        for p in payloads:
            p = p or b""
            n_bytes.append(len(p))
            digests.append(hashlib.md5(p).hexdigest())
            w, h, o, dpi, backend = self._decode(p)
            widths.append(w)
            heights.append(h)
            backends.append(backend)
            formats.append(sniff_format(p))
            orientations.append(o)
            dpis.append(dpi)
        out = batch.drop_columns(["payload"])  # blobs never travel past decode
        return (
            out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
            .append_column("digest", pa.array(digests, pa.string()))
            .append_column("format", pa.array(formats, pa.string()))
            .append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("orientation", pa.array(orientations, pa.int32()))
            .append_column("dpi", pa.array(dpis, pa.int32()))
            .append_column("decode_backend", pa.array(backends, pa.string()))
        )


def decode_payloads(
    ds: Dataset, batch_size: int = 32, concurrency=(1, 4)
) -> Dataset:
    """Run the decode actor pool with blob-appropriate (small) batches."""
    return ds.map_batches(
        DecodePayload,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def fixture_dims(doc_id: int) -> tuple[int, int]:
    """Closed-form fixture dimensions (mirrored by the SQL oracle)."""
    return 2 + doc_id % 31, 2 + doc_id % 17


def fixture_dpi(doc_id: int) -> int:
    return 72 + (doc_id % 4) * 72


def payloads_from_documents(docs: Dataset) -> Dataset:
    """Derive a deterministic binary payload table from the ``documents``
    test table — the fixture for multimodal plumbing tests and the
    oracle-checkable metadata query. ``doc_id % 5 ∈ {0, 1, 2}`` rows carry
    REAL image files (PNG / GIF / BMP from ops/imagebytes.py) with
    closed-form dimensions and density, NUL-padded to the fixed IMG_BYTES
    size; the rest carry the utf-8 bytes of the document text. Every output
    column of the decode stage is therefore a pure function of (doc_id,
    text) that DuckDB can recompute — without running zlib."""
    from .imagebytes import pad_payload, tiny_bmp, tiny_gif, tiny_png

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads = []
        for did, t in zip(ids, texts):
            w, h = fixture_dims(did)
            k = did % 5
            if k == 0:
                payloads.append(pad_payload(tiny_png(w, h, fixture_dpi(did))))
            elif k == 1:
                payloads.append(pad_payload(tiny_gif(w, h)))
            elif k == 2:
                payloads.append(pad_payload(tiny_bmp(w, h, fixture_dpi(did))))
            else:
                payloads.append((t or "").encode("utf-8"))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
