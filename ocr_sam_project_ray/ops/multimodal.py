"""Multimodal binary-column plumbing: opaque ``binary`` payload columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are not in this container, so the decode
kernel is STUBBED: ``DecodePayload`` tries Pillow at actor init and falls
back to a clearly-marked deterministic fake decoder (payload-digest-derived
dimensions). The Ray-side plumbing — schema, small batch sizes for large
blobs, actor signature, output layout — is real and tested; swapping the
kernel for a real decoder is a one-method change.

Batch-size guidance (SURVEY.md §4 memory row): payload batches should be
sized in BYTES, not rows — callers pass ``batch_size`` so that
``batch_size × max_payload × concurrency`` fits the worker heap.
"""

from __future__ import annotations

import hashlib

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

    def _decode(self, payload: bytes) -> tuple[int, int, str]:
        """Real Pillow decode when the library is present AND the payload is
        a decodable image; the per-row ``decode_backend`` label reports which
        kernel actually produced the dimensions (never claims 'pillow' for a
        stubbed row)."""
        if self._Image is not None:  # pragma: no cover - Pillow absent here
            import io

            try:
                with self._Image.open(io.BytesIO(payload)) as im:
                    return int(im.width), int(im.height), "pillow"
            except Exception:
                pass  # not a decodable image → deterministic stub below
        return self._decode_stub(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes, digests, widths, heights, backends = [], [], [], [], []
        formats, orientations, dpis = [], [], []
        for p in payloads:
            p = p or b""
            n_bytes.append(len(p))
            digests.append(hashlib.md5(p).hexdigest())
            w, h, backend = self._decode(p)
            widths.append(w)
            heights.append(h)
            backends.append(backend)
            formats.append(sniff_format(p))
            o, dpi = self.exif_stub(p)
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


def payloads_from_documents(docs: Dataset) -> Dataset:
    """Derive a deterministic binary payload table from the ``documents``
    test table (utf-8 bytes of text) — the fixture for multimodal plumbing
    tests and the oracle-checkable metadata query."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(
                    [(t or "").encode("utf-8") for t in texts], pa.binary()
                ),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
