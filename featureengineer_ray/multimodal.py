"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Image decode is REAL for uncompressed 24-bit BMP (a pure-numpy parser —
:func:`decode_bmp` / :func:`encode_bmp`; no imaging library needed), so
the decode → feature-extract → resize path runs on genuine image bytes
end-to-end and is oracle-checked on deterministic synthetic images
(VERDICT r3 next-#6). Audio decode is likewise REAL for RIFF/WAVE PCM16
(:func:`decode_wav` / :func:`encode_wav` — chunk-walking parser, pure
numpy/struct) with per-clip features (RMS, zero crossings) checked
against an arithmetic SQL oracle. Video decode is REAL for YUV4MPEG2
mono (:func:`decode_y4m` / :func:`encode_y4m` — tagged-header stream
parser) with frame-sampled per-frame means likewise oracle-checked.
COMPRESSED formats are real where losslessness allows an exact oracle:
PNG (stdlib zlib + vectorized un-filtering, all 5 filter types), GIF87a
(hand-written variable-width LZW) and FLAC (``flac.py`` — Rice-coded
fixed predictor, CRC'd frames). Lossy formats (JPEG/MP3/H.264) would
need codec libraries absent from this environment AND have no exact
oracle; they raise NotImplementedError with a clear message. The
deterministic fake-decode stub remains available
(``use_stub_decode=True``) for payloads that are not images at all
(the text-bytes shim).
"""

from __future__ import annotations

import struct

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


def encode_bmp(img: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 → uncompressed 24-bit bottom-up BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB, rows padded to 4 bytes
    — the standard layout, public format spec). Pure numpy/struct."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order; gray replicated into B,G,R
    rows[:, :w * 3] = np.repeat(img[::-1, :, None], 3,
                                axis=2).reshape(h, w * 3)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → grayscale (h, w) uint8 (blue
    channel; the encoder writes gray into all three). Handles bottom-up
    and top-down row order and per-row 4-byte padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    _hsz, w, h, _planes, bits, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bits != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bits={bits}, "
            f"compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                        offset=off).reshape(h, stride)
    px = arr[:, :w * 3].reshape(h, w, 3)[:, :, 0]
    return px[::-1].copy() if bottom_up else px.copy()


def synthetic_image(media_id: int, h: int = 30, w: int = 30) -> np.ndarray:
    """Deterministic test image with a CLOSED-FORM pixel distribution:
    px[r, c] = (3r + 7c + 11·media_id) mod 256 — so a SQL oracle can
    compute the exact mean/std a correct decode must reproduce (w=30
    keeps the BMP row stride unaligned, exercising the padding path)."""
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((3 * r + 7 * c + 11 * int(media_id)) % 256).astype(np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over uint8 arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    da = np.abs(p - a)
    db = np.abs(p - b)
    dc = np.abs(p - c)
    return np.where((da <= db) & (da <= dc), a,
                    np.where(db <= dc, b, c)).astype(np.uint8)


def _png_filter_row(ft: int, cur: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Apply PNG filter type ``ft`` to one raw scanline (encode side);
    all arithmetic is mod 256 via the uint8 cast."""
    cur16 = cur.astype(np.int16)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    ul = np.zeros_like(prev)
    ul[bpp:] = prev[:-bpp]
    if ft == 0:
        return cur.copy()
    if ft == 1:
        return (cur16 - left).astype(np.uint8)
    if ft == 2:
        return (cur16 - prev).astype(np.uint8)
    if ft == 3:
        return (cur16 - ((left.astype(np.int16) + prev) // 2)
                ).astype(np.uint8)
    return (cur16 - _paeth_pred(left, prev, ul)).astype(np.uint8)


def _png_unfilter_row(ft: int, filt: np.ndarray, prev: np.ndarray,
                      bpp: int) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes (decode side).
    None/Up are vectorized; Sub is a per-lane cumsum; Average/Paeth
    need the reconstructed left neighbor, hence the per-byte loop —
    rows are short and this runs inside an actor pool, so the loop is
    per-image setup cost, not a dataset-wide hot path."""
    n = len(filt)
    if ft == 0:
        return filt.copy()
    if ft == 2:
        return (filt.astype(np.int16) + prev).astype(np.uint8)
    if ft == 1:
        lanes = filt.reshape(n // bpp, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(n)
    rec = np.zeros(n, dtype=np.int16)
    for i in range(n):
        a = int(rec[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        if ft == 3:
            pred = (a + b) // 2
        elif ft == 4:
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            da, db, dc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        rec[i] = (int(filt[i]) + pred) % 256
    return rec.astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → genuine non-interlaced
    8-bit PNG bytes (public spec: 8-byte signature + IHDR/IDAT/IEND
    chunks, zlib-deflated filtered scanlines, CRC32 per chunk). The
    per-row filter type CYCLES 0..4 deterministically, so decoding our
    own output exercises every PNG filter (None/Sub/Up/Average/Paeth).
    Pure stdlib zlib + numpy — the same hand-written-binary-format
    stance as the reference's HTK parser (jyh/Utils.py:22-168)."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, bpp = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color, bpp = 2, 3
    else:
        raise ValueError("encode_png: expect (h,w) gray or (h,w,3) RGB")
    h, w = img.shape[:2]
    raw = img.reshape(h, w * bpp)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    scan = bytearray()
    for r in range(h):
        ft = r % 5
        scan.append(ft)
        scan += _png_filter_row(ft, raw[r], prev, bpp).tobytes()
        prev = raw[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(scan), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit grayscale/RGB PNG bytes → (h, w[, 3]) uint8.
    Pure stdlib zlib + numpy: walks the chunk stream (multiple IDATs
    concatenate), inflates, and un-filters every scanline — all five
    PNG filter types supported."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = bitd = color = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            w, h, bitd, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if h is None:
        raise ValueError("PNG payload has no IHDR chunk")
    if bitd != 8 or color not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            "only non-interlaced 8-bit grayscale/RGB PNG supported "
            f"(bit_depth={bitd}, color_type={color}, "
            f"interlace={interlace})")
    bpp = 3 if color == 2 else 1
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)),
                        dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        out[r] = _png_unfilter_row(int(raw[r, 0]), raw[r, 1:], prev, bpp)
        prev = out[r]
    return out.reshape(h, w) if color == 0 else out.reshape(h, w, 3)


def synthetic_image_rgb(media_id: int, h: int = 24,
                        w: int = 17) -> np.ndarray:
    """Deterministic RGB test image with a CLOSED-FORM pixel value:
    px[r, c, ch] = (3r + 7c + 11·media_id + 5·ch) mod 256 — a SQL
    oracle recomputes the exact mean and the position-weighted checksum
    a correct decode must reproduce (w=17 gives a 52-byte scanline so
    the 0..4 filter cycle crosses pixel-lane boundaries unaligned)."""
    r = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(w, dtype=np.int64)[None, :, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((3 * r + 7 * c + 11 * int(media_id) + 5 * ch)
            % 256).astype(np.uint8)


def _decode_image(payload: bytes) -> "np.ndarray":
    """Real decode for uncompressed 24-bit BMP and non-interlaced 8-bit
    PNG (pure numpy/zlib, above); other compressed formats require
    PIL/opencv, absent from this container — a real deployment extends
    this with ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "only BMP/PNG decode available: no imaging library in this "
        "environment for other compressed formats")


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


def _fake_image(payload: bytes, side: int) -> np.ndarray:
    """Deterministic fake decode (shared by the stub stages)."""
    b = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
    base = splitmix64(b ^ np.uint64(len(payload)))
    px = splitmix64(base + np.arange(side * side, dtype=np.uint64)
                    ).astype(np.float64) % 256.0
    return px.reshape(side, side)


class MediaResizer:
    """Actor-pool resize stage: block-mean pooling to a target (h, w).

    The pooling math is REAL (it is what a CPU resize does); only the
    decode feeding it is the deterministic stub (no imaging lib here). A
    real deployment swaps ``_decode_image`` in and keeps this stage."""

    def __init__(self, out_hw: int = 8, src_hw: int = 32,
                 use_stub_decode: bool = True):
        if src_hw % out_hw != 0:
            raise ValueError("out_hw must divide src_hw (block pooling)")
        self.out_hw, self.src_hw = out_hw, src_hw
        self.use_stub = use_stub_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        f = self.src_hw // self.out_hw
        thumbs = np.zeros((len(payloads), self.out_hw * self.out_hw))
        for i, p in enumerate(payloads):
            img = (_fake_image(p, self.src_hw) if self.use_stub
                   else _decode_image(p))
            t = img.reshape(self.out_hw, f, self.out_hw, f).mean(axis=(1, 3))
            thumbs[i] = t.reshape(-1)
        flat = pa.array(thumbs.reshape(-1), type=pa.float64())
        offs = pa.array(np.arange(len(payloads) + 1, dtype=np.int32)
                        * (self.out_hw * self.out_hw), type=pa.int32())
        out = batch.append_column(
            "thumb", pa.ListArray.from_arrays(offs, flat))
        out = out.append_column(
            "thumb_hw", pa.array([self.out_hw] * len(payloads),
                                 type=pa.int64()))
        return out


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one input row
    → one OUTPUT ROW PER SAMPLED FRAME (explode), every ``stride``-th
    frame. Frame count derives from payload length (stub decode); the
    explode/bounded-batch plumbing is the real, tested part."""

    def __init__(self, stride: int = 4, frame_bytes: int = 256,
                 fake_hw: int = 16, use_stub_decode: bool = True):
        self.stride = stride
        self.frame_bytes = frame_bytes
        self.fake_hw = fake_hw
        self.use_stub = use_stub_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_fi, out_n, out_mean = [], [], [], []
        for mid, p in zip(ids, payloads):
            if not self.use_stub:
                _decode_image(p)  # NotImplementedError path
            n_frames = max(1, len(p) // self.frame_bytes)
            for fi in range(0, n_frames, self.stride):
                frame = _fake_image(
                    p[fi * self.frame_bytes:(fi + 1) * self.frame_bytes]
                    or p[:1], self.fake_hw)
                out_id.append(int(mid))
                out_fi.append(fi)
                out_n.append(n_frames)
                out_mean.append(float(frame.mean()))
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_fi, type=pa.int64()),
            "n_frames": pa.array(out_n, type=pa.int64()),
            "frame_mean": pa.array(out_mean, type=pa.float64()),
        })


def frame_pipeline(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   stride: int = 4, batch_size: int = 128,
                   concurrency=(1, 4)):
    """documents → payloads → frame-sampled rows (video-style explode)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_payload(batch, text_col=text_col, id_col=id_col)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride})


def attach_bmp_payload(batch: pa.Table, *, id_col: str = "doc_id",
                       h: int = 30, w: int = 30) -> pa.Table:
    """REAL image payloads: one deterministic synthetic BMP per row
    (closed-form pixels, :func:`synthetic_image`), encoded to genuine
    uncompressed 24-bit BMP bytes — the oracle-checkable counterpart of
    the text-bytes shim."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_bmp(synthetic_image(int(i), h, w)) for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["image"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


def bmp_decode_pipeline(ds, *, id_col: str = "doc_id", h: int = 30,
                        w: int = 30, batch_size: int = 256,
                        concurrency=(1, 4)):
    """documents → real BMP payloads → actor-pool REAL decode + feature
    extraction (no stub anywhere on this path)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_bmp_payload(batch, id_col=id_col, h=h, w=w)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"use_stub_decode": False})


def attach_png_payload(batch: pa.Table, *, id_col: str = "doc_id",
                       h: int = 24, w: int = 17) -> pa.Table:
    """REAL compressed-image payloads: one deterministic synthetic RGB
    PNG per row (closed-form pixels, :func:`synthetic_image_rgb`),
    encoded to genuine zlib-deflated PNG bytes with the full 0..4
    filter cycle."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_png(synthetic_image_rgb(int(i), h, w)) for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["image"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


class PngFeatureExtractor:
    """Actor-pool stage: REAL PNG decode + position-sensitive features.

    Emits the pixel mean AND a position-weighted checksum
    ``px_wsum = Σ px[i]·(i+1)`` over the flattened (row-major, channel
    minor) image — the mean alone is invariant to row/channel
    permutations, so a decoder that un-filters correctly but reassembles
    rows in the wrong order would still pass it; the weighted sum fails
    on ANY positional error. Integer-exact in int64."""

    def __init__(self):
        pass  # decoder is pure-function; nothing to load per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means, wsums, hs, ws, chans = [], [], [], [], []
        for p in payloads:
            img = decode_png(p)
            flat = img.reshape(-1).astype(np.int64)
            means.append(float(flat.mean()))
            wsums.append(int((flat * (np.arange(len(flat),
                                                dtype=np.int64) + 1)).sum()))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            chans.append(img.shape[2] if img.ndim == 3 else 1)
        out = batch.append_column("px_mean",
                                  pa.array(means, type=pa.float64()))
        out = out.append_column("px_wsum", pa.array(wsums, type=pa.int64()))
        out = out.append_column("height", pa.array(hs, type=pa.int64()))
        out = out.append_column("width", pa.array(ws, type=pa.int64()))
        out = out.append_column("n_channels",
                                pa.array(chans, type=pa.int64()))
        return out


def png_decode_pipeline(ds, *, id_col: str = "doc_id", h: int = 24,
                        w: int = 17, batch_size: int = 256,
                        concurrency=(1, 4)):
    """documents → real PNG payloads → actor-pool REAL decode (zlib
    inflate + per-row un-filter) + feature extraction."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_png_payload(batch, id_col=id_col, h=h, w=w)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        PngFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 PCM → RIFF/WAVE bytes (canonical 44-byte header:
    RIFF size + fmt chunk (PCM, 1 channel, 16 bit) + data chunk —
    public format spec). Pure numpy/struct; no audio library."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    n = len(data)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + n, b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", n)
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (int16 samples, sample_rate).

    Walks the chunk list (tolerates extra chunks such as LIST/INFO
    before or after data; chunk bodies are word-aligned per the spec)
    instead of assuming a fixed 44-byte layout."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sr: int | None = None
    fmt = 1
    raw: tuple[int, int] | None = None  # (offset, size) of data body
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, sr = struct.unpack_from("<HHI", payload, body)
            (bits,) = struct.unpack_from("<H", payload, body + 14)
            if not ((fmt == 1 and bits == 16) or (fmt == 7 and bits == 8)) \
                    or channels != 1:
                raise NotImplementedError(
                    "only mono 16-bit PCM or 8-bit mu-law WAV supported "
                    f"(fmt={fmt}, channels={channels}, bits={bits})")
        elif cid == b"data":
            raw = (body, sz)
        pos = body + sz + (sz & 1)  # chunks are word-aligned
    if sr is None or raw is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    body, sz = raw
    if fmt == 7:  # G.711 mu-law: companded byte -> int16 expansion
        codes = np.frombuffer(payload, dtype=np.uint8, count=sz,
                              offset=body)
        return mulaw_decode(codes), sr
    samples = np.frombuffer(payload, dtype="<i2", count=sz // 2,
                            offset=body)
    return samples, sr


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law expansion (ITU-T G.711 table 2a, the standard
    telephony companding): one code byte → int16. Vectorized closed
    form — u = ~code; t = ((mantissa·8)+132)·2^exponent;
    value = ±(t−132) — the same arithmetic the SQL oracle recomputes."""
    u = (255 - np.asarray(codes, dtype=np.int64))
    exp = (u >> 4) & 0x7
    mant = u & 0x0F
    t = ((mant << 3) + 0x84) << exp
    return np.where(u >= 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """G.711 mu-law compression: int16 → one code byte (clip at 32635,
    bias 0x84, 3-bit exponent segment + 4-bit mantissa, bits inverted
    on the wire). Vectorized; exact inverse property tested:
    mulaw_decode(mulaw_encode(x)) is the standard quantization of x."""
    x = np.asarray(samples, dtype=np.int32)
    sign = (x < 0).astype(np.int64)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    # mag in [132, 32767] → floor(log2) in [7, 14] → exponent in [0, 7];
    # log2 is exact at powers of two in IEEE so the floor is safe
    exp = np.floor(np.log2(mag)).astype(np.int64) - 7
    mant = (mag >> (exp + 3)) & 0x0F
    return (~((sign << 7) | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def encode_wav_mulaw(codes: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono mu-law code bytes → RIFF/WAVE (fmt tag 7, 8-bit) with the
    spec-required ``fact`` chunk for non-PCM formats."""
    codes = np.asarray(codes, dtype=np.uint8)
    data = codes.tobytes()
    n = len(data)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sII4sI",
        b"RIFF", 4 + 24 + 12 + 8 + n + (n & 1), b"WAVE",
        b"fmt ", 16, 7, 1, sample_rate, sample_rate, 1, 8,
        b"fact", 4, len(codes),
        b"data", n)
    return hdr + data + (b"\x00" if n & 1 else b"")


def synthetic_audio(media_id: int, n: int = 1000) -> np.ndarray:
    """Deterministic test signal with a CLOSED-FORM sample distribution:
    s[t] = ((13t + 17·media_id) mod 4001) − 2000 — so a SQL oracle can
    arithmetically recompute the exact mean / RMS / zero-crossing count
    a correct decode must reproduce (the audio analog of
    :func:`synthetic_image`)."""
    t = np.arange(n, dtype=np.int64)
    return (((13 * t + 17 * int(media_id)) % 4001) - 2000).astype(np.int16)


def attach_wav_payload(batch: pa.Table, *, id_col: str = "doc_id",
                       n: int = 1000,
                       sample_rate: int = 16000) -> pa.Table:
    """REAL audio payloads: one deterministic synthetic WAV per row,
    encoded to genuine RIFF PCM16 bytes."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_wav(synthetic_audio(int(i), n), sample_rate)
                for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["audio"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


class AudioFeatureExtractor:
    """Actor-pool audio stage: REAL WAV decode (pure numpy, above) →
    per-clip features: sample count, rate, mean amplitude, RMS,
    zero-crossing count. Signal math in int64/float64 (an int16 square
    overflows — 2000² > 32767 — so samples are widened first)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_s, rates, means, rmss, zcs = [], [], [], [], []
        for p in payloads:
            s16, sr = decode_wav(p)
            s = s16.astype(np.int64)
            n = len(s)
            n_s.append(n)
            rates.append(sr)
            means.append(float(s.mean()) if n else 0.0)
            rmss.append(float(np.sqrt((s * s).mean())) if n else 0.0)
            zcs.append(int(np.count_nonzero(s[:-1] * s[1:] < 0)))
        out = batch.append_column("n_samples",
                                  pa.array(n_s, type=pa.int64()))
        out = out.append_column("sample_rate",
                                pa.array(rates, type=pa.int64()))
        out = out.append_column("amp_mean",
                                pa.array(means, type=pa.float64()))
        out = out.append_column("amp_rms",
                                pa.array(rmss, type=pa.float64()))
        return out.append_column("n_zero_cross",
                                 pa.array(zcs, type=pa.int64()))


def wav_decode_pipeline(ds, *, id_col: str = "doc_id", n: int = 1000,
                        sample_rate: int = 16000, batch_size: int = 256,
                        concurrency=(1, 4)):
    """documents → real WAV payloads → actor-pool REAL decode + feature
    extraction (no stub anywhere on this path — the audio counterpart
    of :func:`bmp_decode_pipeline`)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_wav_payload(batch, id_col=id_col, n=n,
                                  sample_rate=sample_rate)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        AudioFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 grayscale → YUV4MPEG2 bytes with the
    ``Cmono`` colorspace (one luma plane per frame — public format
    spec, the uncompressed interchange format of the mjpegtools
    suite). Pure numpy; no video library."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    hdr = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
           ).encode()
    marker = b"FRAME\n"
    return hdr + b"".join(marker + frames[i].tobytes() for i in range(n))


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 mono bytes → ((n_frames, h, w) uint8, (fps_n, fps_d)).

    Parses the tagged stream header (W/H/F/C parameters in any order,
    unknown tags such as X metadata skipped) and walks FRAME markers,
    tolerating per-frame parameter strings between ``FRAME`` and the
    newline as the spec allows."""
    eol = payload.find(b"\n")
    if eol < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    cs = "420jpeg"  # spec default when C is absent
    for tok in payload[:eol].split(b" ")[1:]:
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            cs = val
    if w is None or h is None:
        raise ValueError("Y4M header missing W or H")
    if cs != "mono":
        raise NotImplementedError(
            f"only Cmono Y4M supported (colorspace={cs}: chroma planes "
            "need no decoder, but nothing here emits them)")
    fsz = h * w
    frames = []
    pos = eol + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        nl = payload.find(b"\n", pos)
        if nl < 0 or nl + 1 + fsz > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload, dtype=np.uint8, count=fsz,
                                    offset=nl + 1).reshape(h, w))
        pos = nl + 1 + fsz
    out = (np.stack(frames) if frames
           else np.zeros((0, h, w), dtype=np.uint8))
    return out, fps


def synthetic_video(media_id: int, n_frames: int = 12, h: int = 16,
                    w: int = 16) -> np.ndarray:
    """Deterministic test clip with a CLOSED-FORM pixel distribution:
    px[f, y, x] = (5f + 3y + 7x + 11·media_id) mod 256 — the video
    analog of :func:`synthetic_image`; a SQL oracle recomputes each
    frame's exact mean (h·w = 256 is a power of two, so the float64
    mean is exact)."""
    f = np.arange(n_frames, dtype=np.int64)[:, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None]
    x = np.arange(w, dtype=np.int64)[None, None, :]
    return ((5 * f + 3 * y + 7 * x + 11 * int(media_id)) % 256
            ).astype(np.uint8)


def attach_y4m_payload(batch: pa.Table, *, id_col: str = "doc_id",
                       n_frames: int = 12, h: int = 16,
                       w: int = 16) -> pa.Table:
    """REAL video payloads: one deterministic synthetic clip per row,
    encoded to genuine YUV4MPEG2 bytes."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_y4m(synthetic_video(int(i), n_frames, h, w))
                for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["video"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


class VideoFrameSampler:
    """Actor-pool video stage: REAL Y4M decode (pure numpy, above) →
    one OUTPUT ROW PER SAMPLED FRAME (explode), every ``stride``-th
    frame — frame_idx, total frame count, frame dims, exact frame mean.
    The real-decode counterpart of the :class:`FrameSampler` stub."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        out_id, out_fi, out_n, out_h, out_w, out_mean = ([], [], [], [],
                                                         [], [])
        for mid, p in zip(ids, payloads):
            clip, _fps = decode_y4m(p)
            n, h, w = clip.shape
            sampled = clip[::self.stride]
            means = sampled.reshape(len(sampled), -1).astype(
                np.float64).mean(axis=1)
            for j, m in enumerate(means):
                out_id.append(int(mid))
                out_fi.append(j * self.stride)
                out_n.append(n)
                out_h.append(h)
                out_w.append(w)
                out_mean.append(float(m))
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_fi, type=pa.int64()),
            "n_frames": pa.array(out_n, type=pa.int64()),
            "height": pa.array(out_h, type=pa.int64()),
            "width": pa.array(out_w, type=pa.int64()),
            "frame_mean": pa.array(out_mean, type=pa.float64()),
        })


def y4m_decode_pipeline(ds, *, id_col: str = "doc_id",
                        n_frames: int = 12, h: int = 16, w: int = 16,
                        stride: int = 4, batch_size: int = 128,
                        concurrency=(1, 4)):
    """documents → real Y4M payloads → actor-pool REAL decode +
    frame-sampled explode (no stub anywhere on this path — the video
    counterpart of :func:`bmp_decode_pipeline` /
    :func:`wav_decode_pipeline`). batch_size stays small: a clip is
    n_frames·h·w bytes and the explode multiplies rows."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_y4m_payload(batch, id_col=id_col,
                                  n_frames=n_frames, h=h, w=w)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        VideoFrameSampler, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride})


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


# ---------------------------------------------------------------------------
# GIF87a (LZW) — the third REAL image codec (after BMP and PNG), pure
# stdlib/numpy. GIF's LZW is LOSSLESS, so — unlike JPEG — a hand-written
# encoder/decoder pair round-trips bit-exactly and the decode query can be
# hash-checked against a closed-form SQL oracle, the same stance as the
# reference's hand-parsed HTK binary format (jyh/Utils.py:22-168).
# ---------------------------------------------------------------------------


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w) uint8 image → genuine GIF87a bytes with a 256-entry
    grayscale global color table and REAL LZW-compressed image data
    (variable-width codes 9→12 bits, LSB-first bitstream, CLEAR emitted
    on table overflow, data chopped into ≤255-byte sub-blocks)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_gif: expect a (h, w) uint8 image")
    h, w = img.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT: 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW minimum code size

    CLEAR, EOI = 256, 257
    bits = bytearray()
    acc = n_acc = 0

    def emit(code: int, width: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    table: dict[bytes, int] = {}

    def reset():
        table.clear()
        return 258, 9  # next free code, code width

    next_free, width = reset()
    emit(CLEAR, width)
    pixels = img.reshape(-1).tobytes()
    seq = b""
    for i in range(len(pixels)):
        cand = seq + pixels[i:i + 1]
        if cand in table or len(cand) == 1:
            seq = cand
            continue
        emit(table[seq] if len(seq) > 1 else seq[0], width)
        table[cand] = next_free
        next_free += 1
        if next_free == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(CLEAR, width)
                next_free, width = reset()
        seq = pixels[i:i + 1]
    if seq:
        emit(table[seq] if len(seq) > 1 else seq[0], width)
        # phantom add: the residual emit carries no table add, but the
        # decoder (which adds one entry per data code after the first)
        # is exactly one entry behind the encoder — advancing next_free
        # here keeps the width-growth triggers aligned at the EOI read
        # (enc fires at next_free == 1<<w, dec at next_free == (1<<w)-1;
        # see the paired condition in decode_gif)
        next_free += 1
        if next_free == (1 << width) and width < 12:
            width += 1
    emit(EOI, width)
    if n_acc:
        bits.append(acc & 0xFF)
    for off in range(0, len(bits), 255):
        chunk = bytes(bits[off:off + 255])
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a bytes → (h, w, 3) uint8 RGB of the FIRST image.
    Walks the block stream (extensions skipped), reads the global or
    local color table, and runs a full variable-width LZW decode
    (CLEAR/EOI, the KwKwK self-referential case, 9→12-bit growth,
    deferred clear). Non-interlaced only. The per-code Python loop is
    per-image setup cost inside an actor pool, like the PNG un-filter."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w_s, h_s, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, w, h, ipack = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if ipack & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        pal = gct
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        CLEAR, EOI = 1 << min_code, (1 << min_code) + 1
        base = [bytes([i]) for i in range(1 << min_code)]
        table: list[bytes] = []
        width = min_code + 1
        acc = n_acc = bit_pos = 0
        out = bytearray()
        prev: bytes | None = None

        def next_code() -> int:
            nonlocal acc, n_acc, bit_pos
            while n_acc < width:
                if bit_pos >= len(data):
                    return EOI  # truncated stream: treat as end
                acc |= data[bit_pos] << n_acc
                bit_pos += 1
                n_acc += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_acc -= width
            return code

        while True:
            code = next_code()
            if code == EOI:
                break
            if code == CLEAR:
                table = []
                width = min_code + 1
                prev = None
                continue
            n_known = (1 << min_code) + 2 + len(table)
            if code < (1 << min_code):
                entry = base[code]
            elif code - (1 << min_code) - 2 < len(table):
                entry = table[code - (1 << min_code) - 2]
            elif code == n_known and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                # one-early trigger: the decoder's table lags the
                # encoder's by exactly one entry, so it must widen one
                # position sooner (encoder fires at next_free == 1<<w)
                if n_known + 1 == (1 << width) - 1 and width < 12:
                    width += 1
            prev = entry
        idx = np.frombuffer(bytes(out[:w * h]), dtype=np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF image data truncated")
        return pal[idx].reshape(h, w, 3)
    raise ValueError("GIF payload has no image block")


def synthetic_image_gray(media_id: int, h: int = 24,
                         w: int = 17) -> np.ndarray:
    """Deterministic grayscale test image with a CLOSED-FORM pixel
    value: px[r, c] = (3r + 7c + 11·media_id) mod 256 — the SQL oracle
    recomputes the exact mean and position-weighted checksum of the
    palette-expanded RGB a correct LZW decode must reproduce."""
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return ((3 * r + 7 * c + 11 * int(media_id)) % 256).astype(np.uint8)


def attach_gif_payload(batch: pa.Table, *, id_col: str = "doc_id",
                       h: int = 24, w: int = 17) -> pa.Table:
    """REAL LZW-compressed image payloads: one deterministic synthetic
    grayscale GIF87a per row (closed-form pixels,
    :func:`synthetic_image_gray`)."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_gif(synthetic_image_gray(int(i), h, w)) for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["image"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


class GifFeatureExtractor:
    """Actor-pool stage: REAL GIF/LZW decode + the same
    position-sensitive features as :class:`PngFeatureExtractor`
    (px_mean alone is permutation-invariant; px_wsum fails on ANY
    positional error in the LZW table reconstruction)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means, wsums, hs, ws, chans = [], [], [], [], []
        for p in payloads:
            img = decode_gif(p)
            flat = img.reshape(-1).astype(np.int64)
            means.append(float(flat.mean()))
            wsums.append(int((flat * (np.arange(len(flat),
                                                dtype=np.int64) + 1)).sum()))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            chans.append(img.shape[2])
        out = batch.append_column("px_mean",
                                  pa.array(means, type=pa.float64()))
        out = out.append_column("px_wsum", pa.array(wsums, type=pa.int64()))
        out = out.append_column("height", pa.array(hs, type=pa.int64()))
        out = out.append_column("width", pa.array(ws, type=pa.int64()))
        out = out.append_column("n_channels",
                                pa.array(chans, type=pa.int64()))
        return out


def gif_decode_pipeline(ds, *, id_col: str = "doc_id", h: int = 24,
                        w: int = 17, batch_size: int = 256,
                        concurrency=(1, 4)):
    """documents → real GIF payloads → actor-pool REAL LZW decode +
    feature extraction."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_gif_payload(batch, id_col=id_col, h=h, w=w)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        GifFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def synthetic_mulaw_codes(media_id: int, n: int = 1000) -> np.ndarray:
    """Deterministic mu-law code stream with CLOSED-FORM bytes:
    c[i] = (7i + 13·media_id) mod 256 — the SQL oracle re-derives the
    codes AND the G.711 expansion arithmetically."""
    i = np.arange(n, dtype=np.int64)
    return ((7 * i + 13 * int(media_id)) % 256).astype(np.uint8)


def attach_mulaw_payload(batch: pa.Table, *, id_col: str = "doc_id",
                         n: int = 1000) -> pa.Table:
    """REAL companded-audio payloads: one deterministic mu-law WAV
    (fmt tag 7) per row."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_wav_mulaw(synthetic_mulaw_codes(int(i), n))
                for i in ids]
    pay = pa.array(payloads, type=pa.binary())
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pay,
        "media_type": pa.array(["audio"] * len(ids)),
        "n_bytes": pa.compute.binary_length(pay).cast(pa.int64()),
    })


class MulawFeatureExtractor:
    """Actor-pool stage: REAL mu-law WAV decode (chunk walk + G.711
    expansion) + the same amplitude features as
    :class:`AudioFeatureExtractor`, computed on the EXPANDED int16."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ns, srs, means, rmss, zcs = [], [], [], [], []
        for p in payloads:
            samples, sr = decode_wav(p)
            v = samples.astype(np.float64)
            ns.append(len(samples))
            srs.append(sr)
            means.append(float(v.mean()))
            rmss.append(float(np.sqrt((v * v).mean())))
            zcs.append(int(np.sum(v[1:] * v[:-1] < 0)))
        out = batch.append_column("n_samples",
                                  pa.array(ns, type=pa.int64()))
        out = out.append_column("sample_rate",
                                pa.array(srs, type=pa.int64()))
        out = out.append_column("amp_mean",
                                pa.array(means, type=pa.float64()))
        out = out.append_column("amp_rms",
                                pa.array(rmss, type=pa.float64()))
        return out.append_column("n_zero_cross",
                                 pa.array(zcs, type=pa.int64()))


def mulaw_decode_pipeline(ds, *, id_col: str = "doc_id", n: int = 1000,
                          batch_size: int = 256, concurrency=(1, 4)):
    """documents → real mu-law WAV payloads → actor-pool REAL decode
    (G.711 expansion) + amplitude features."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_mulaw_payload(batch, id_col=id_col, n=n)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        MulawFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


# --------------------------------------------------------------------------
# framed log-mel filterbank features (the FeaturesServer analog)
# --------------------------------------------------------------------------

def mel_filterbank(n_filters: int, n_fft: int, sample_rate: int
                   ) -> np.ndarray:
    """Triangular mel filterbank (n_filters × (n_fft//2 + 1)), HTK mel
    scale 2595·log10(1 + f/700) — the public filterbank construction the
    reference's feature extraction delegates to sidekit's FeaturesServer
    (IVector.py:256-266). Deterministic closed-form numpy."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64)
                                 / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64)
                                 / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2.0),
                       n_filters + 2)
    pts = mel_to_hz(mels) / sample_rate * n_fft  # fractional fft bins
    fb = np.zeros((n_filters, n_bins), dtype=np.float64)
    bins = np.arange(n_bins, dtype=np.float64)
    for i in range(n_filters):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (bins - lo) / max(mid - lo, 1e-12)
        down = (hi - bins) / max(hi - mid, 1e-12)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def fbank(sig: np.ndarray, sample_rate: int, *, n_filters: int = 20,
          frame_ms: float = 25.0, hop_ms: float = 10.0,
          eps: float = 1e-10) -> np.ndarray:
    """Framed log-mel filterbank energies: 25 ms Hamming frames every
    10 ms → |rfft|² → mel filterbank → log. Returns
    (n_frames × n_filters) float64; empty (0 × n_filters) when the
    signal is shorter than one frame. All frames process as ONE
    strided matrix (no per-frame Python)."""
    frame_len = int(round(sample_rate * frame_ms / 1000.0))
    hop = max(int(round(sample_rate * hop_ms / 1000.0)), 1)
    n_fft = 1 << max(frame_len - 1, 1).bit_length()
    fb = mel_filterbank(n_filters, n_fft, sample_rate)
    x = np.asarray(sig, dtype=np.float64)
    if len(x) < frame_len:
        return np.zeros((0, n_filters), dtype=np.float64)
    n_frames = 1 + (len(x) - frame_len) // hop
    idx = (np.arange(frame_len)[None, :]
           + hop * np.arange(n_frames)[:, None])
    frames = x[idx] * np.hamming(frame_len)[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    return np.log(spec @ fb.T + eps)


class FbankExtractor:
    """Actor-pool featurizer (T1/M1 shape): the filterbank matrix and
    window build ONCE per actor in ``__init__``; each batch decodes its
    WAV payloads and emits per-record fbank summaries (frame count +
    per-filter time means) — the feature layout the reference writes
    per utterance (S2) without shipping frame matrices through the
    exchange."""

    def __init__(self, *, n_filters: int = 20,
                 payload_col: str = "payload"):
        self.n_filters = n_filters
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, means = [], [], []
        id_np = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column(self.payload_col).to_pylist()
        for mid, buf in zip(id_np, payloads):
            sig, sr = decode_wav(buf)
            f = fbank(sig, sr, n_filters=self.n_filters)
            ids.append(int(mid))
            n_frames.append(f.shape[0])
            means.append(f.mean(axis=0) if f.shape[0]
                         else np.zeros(self.n_filters))
        flat = (np.concatenate([m for m in means])
                if means else np.zeros(0))
        offsets = np.arange(0, (len(means) + 1) * self.n_filters,
                            self.n_filters, dtype=np.int32)
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "n_frames": pa.array(n_frames, type=pa.int64()),
            "fbank_mean": pa.ListArray.from_arrays(
                pa.array(offsets),
                pa.array(flat, type=pa.float64())),
        })


def fbank_pipeline(ds, *, id_col: str = "doc_id", n: int = 1000,
                   sample_rate: int = 16000, n_filters: int = 20,
                   batch_size: int = 256, concurrency=(1, 4)):
    """documents → real WAV payloads → actor-pool framed log-mel fbank
    (decode + FFT + filterbank per actor; the full FeaturesServer-style
    M1 featurizer on genuine bytes)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_wav_payload(batch, id_col=id_col, n=n,
                                  sample_rate=sample_rate)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        FbankExtractor, fn_constructor_kwargs={"n_filters": n_filters},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# --------------------------------------------------------------------------
# FLAC (compressed lossless) pipeline
# --------------------------------------------------------------------------

def attach_flac_payload(batch: pa.Table, *, id_col: str = "doc_id",
                        n: int = 1000,
                        sample_rate: int = 16000) -> pa.Table:
    """REAL compressed-audio payloads: one deterministic synthetic
    signal per row, encoded to genuine FLAC bytes (Rice-coded fixed
    predictor, CRC'd frames — ``flac.encode_flac``)."""
    from .flac import encode_flac

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [encode_flac(synthetic_audio(int(i), n), sample_rate)
                for i in ids]
    return pa.table({
        "media_id": batch.column(id_col).cast(pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(["audio/flac"] * len(ids)),
    })


class FlacFeatureExtractor:
    """Actor-pool stage: REAL FLAC decode (bit-level Rice + CRC
    verification, ``flac.decode_flac``) → the same amplitude features
    as the WAV path, so a decoder bug anywhere in the bitstream walk
    fails the arithmetic SQL oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .flac import decode_flac

        payloads = batch.column("payload").to_pylist()
        n_s, n_b, means, rmss, zcs = [], [], [], [], []
        for p in payloads:
            s16, _sr = decode_flac(p)
            s = s16.astype(np.int64)
            n = len(s)
            n_s.append(n)
            n_b.append(len(p))
            means.append(float(s.mean()) if n else 0.0)
            rmss.append(float(np.sqrt((s * s).mean())) if n else 0.0)
            zcs.append(int(np.count_nonzero(s[:-1] * s[1:] < 0)))
        out = batch.append_column("n_samples",
                                  pa.array(n_s, type=pa.int64()))
        out = out.append_column("n_bytes", pa.array(n_b, type=pa.int64()))
        out = out.append_column("amp_mean",
                                pa.array(means, type=pa.float64()))
        out = out.append_column("amp_rms",
                                pa.array(rmss, type=pa.float64()))
        return out.append_column("n_zero_cross",
                                 pa.array(zcs, type=pa.int64()))


def flac_decode_pipeline(ds, *, id_col: str = "doc_id", n: int = 1000,
                         sample_rate: int = 16000, batch_size: int = 256,
                         concurrency=(1, 4)):
    """documents → real FLAC payloads → actor-pool REAL decode +
    features (the compressed-lossless counterpart of
    :func:`wav_decode_pipeline`)."""

    def attach(batch: pa.Table) -> pa.Table:
        return attach_flac_payload(batch, id_col=id_col, n=n,
                                   sample_rate=sample_rate)

    return ds.map_batches(attach, batch_format="pyarrow").map_batches(
        FlacFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)
