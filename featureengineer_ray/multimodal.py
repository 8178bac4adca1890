"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/frame-sample kernels themselves are STUBBED (no
image/audio libraries in this environment — clearly marked below); the
Ray-side plumbing is real and tested: schema, actor-pool stage shape,
bounded batch sizes for large payloads, and deterministic fake features so
pipelines are end-to-end runnable and oracle-checkable on the byte-level
columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import splitmix64

MEDIA_SCHEMA_FIELDS = [
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("n_bytes", pa.int64()),
]


def attach_payload(batch: pa.Table, *, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Testdata shim: treat utf-8 bytes of a text column as the opaque
    payload (real pipelines read_binary_files / parquet binary columns)."""
    payload = batch.column(text_col).cast(pa.binary())
    n_bytes = pa.compute.binary_length(payload).cast(pa.int64())
    out = pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": payload,
        "media_type": pa.array(["image"] * batch.num_rows),
        "n_bytes": n_bytes,
    })
    return out


def _decode_image(payload: bytes) -> "np.ndarray":
    """STUB — image decoding requires PIL/opencv, not present in this
    container. A real deployment replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``."""
    raise NotImplementedError(
        "image decode stubbed: no imaging library in this environment")


class MediaFeatureExtractor:
    """Actor-pool map_batches stage for binary payloads.

    __init__ loads the (stubbed) model once per actor; __call__ processes a
    small batch (large payloads → keep batch_size small and rely on the
    object store for spilling). With ``use_stub_decode=True`` it emits
    deterministic fake decode features (seeded by payload bytes) so the
    plumbing is exercised end-to-end; with False it raises NotImplementedError
    from the decode stub.
    """

    def __init__(self, use_stub_decode: bool = True, fake_hw: int = 32):
        self.use_stub = use_stub_decode
        self.fake_hw = fake_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means, stds, widths, heights = [], [], [], []
        for p in payloads:
            if not self.use_stub:
                img = _decode_image(p)  # NotImplementedError path
            else:
                # deterministic fake decode: bytes → seeded pseudo-image
                b = np.frombuffer(p[:8].ljust(8, b"\0"), dtype=np.uint64)
                base = splitmix64(b ^ np.uint64(len(p)))
                side = self.fake_hw
                px = splitmix64(
                    base + np.arange(side * side, dtype=np.uint64)
                ).astype(np.float64) % 256.0
                img = px.reshape(side, side)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        out = batch.append_column("px_mean", pa.array(means, type=pa.float64()))
        out = out.append_column("px_std", pa.array(stds, type=pa.float64()))
        out = out.append_column("height", pa.array(heights, type=pa.int64()))
        out = out.append_column("width", pa.array(widths, type=pa.int64()))
        return out


def media_pipeline(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   batch_size: int = 256, concurrency=(1, 4)):
    """documents → payload table → actor-pool feature extraction.

    batch_size is deliberately small: payload × batch × concurrency must fit
    worker heaps (binary payloads dominate memory, SURVEY.md §7.6)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_payload(batch, text_col=text_col, id_col=id_col)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)
