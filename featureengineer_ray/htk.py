"""HTK binary feature-file source/sink (SURVEY §2 S9 — pluggable formats).

The reference ships a hand-written HTK parser (``jyh/Utils.py:22-168``,
HTK Book §5.10 header layout): 12-byte big-endian header
``nSamples:int32, sampPeriod:int32, sampSize:int16, parmKind:int16``
followed by ``nSamples`` fixed-width frames. This is an independent
re-implementation of the same on-disk format, Ray-Data-first:

- :func:`read_htk` — ``ray.data.read_binary_files`` fan-out, one
  vectorized numpy decode per FILE (``np.frombuffer`` + reshape; no
  per-value struct loop — the reference unpacks value-by-value), rows
  out as ``(utt, frame, feat list<float32>)``.
- decode parity with the reference's three payload layouts:
  float32 frames (default), int16 ``WAVEFORM``/``IREFC`` scaled by
  1/32767, and ``_C`` compressed int16 with per-dim ``(x + B) / A``
  (A/B vectors stored as two leading float32 frames; nSamples
  includes those 4 half-frames). ``_K`` CRC is skipped like the
  reference; ``_V`` (VQ) raises.
- :func:`write_htk` — the sink, used by tests and the round-trip
  query oracle.

At 100 TB scale the unit of parallelism is the FILE (utterances are
KB-MB sized); ``read_binary_files`` streams paths → tasks with Ray's
usual block packing, so millions of small files fan out without
driver-side lists of their contents.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa

_BASIC_KINDS = ["WAVEFORM", "LPC", "LPREFC", "LPCEPSTRA", "LPDELCEP",
                "IREFC", "MFCC", "FBANK", "MELSPEC", "USER", "DISCRETE",
                "PLP"]
_QUALIFIERS = [(0o100, "E"), (0o200, "N"), (0o400, "D"), (0o1000, "A"),
               (0o2000, "C"), (0o4000, "Z"), (0o10000, "K"),
               (0o20000, "0"), (0o40000, "V"), (0o100000, "T")]

PARM_USER = 9
PARM_MFCC = 6


def parse_kind(parm_kind: int) -> tuple[str, set[str]]:
    basic = parm_kind & 0x3F
    kind = _BASIC_KINDS[basic] if basic < len(_BASIC_KINDS) else "ERROR"
    quals = {q for bit, q in _QUALIFIERS if parm_kind & bit}
    return kind, quals


def decode_htk(buf: bytes) -> tuple[np.ndarray, dict]:
    """Decode one HTK file's bytes → (frames[nSamples, nFeatures]
    float32, header dict). Vectorized: one frombuffer per payload."""
    if len(buf) < 12:
        raise ValueError(f"HTK file truncated: {len(buf)} bytes")
    n_samples, samp_period, samp_size, parm_kind = struct.unpack(
        ">iihh", buf[:12])
    kind, quals = parse_kind(parm_kind)
    if "V" in quals:
        raise NotImplementedError("HTK VQ (_V) payloads not supported")
    int16_payload = kind in ("WAVEFORM", "IREFC") or "C" in quals
    n_feat = samp_size // 2 if int16_payload else samp_size // 4
    off = 12
    if "C" in quals:
        # compressed: A then B vectors as float32, and the stored
        # nSamples counts them as 4 int16 half-frames
        ab = np.frombuffer(buf, dtype=">f4", count=2 * n_feat, offset=off)
        a, b = ab[:n_feat].astype(np.float64), ab[n_feat:].astype(np.float64)
        off += 8 * n_feat
        n_samples -= 4
        raw = np.frombuffer(buf, dtype=">i2", count=n_samples * n_feat,
                            offset=off).reshape(n_samples, n_feat)
        data = ((raw.astype(np.float64) + b) / a).astype(np.float32)
    elif int16_payload:
        raw = np.frombuffer(buf, dtype=">i2", count=n_samples * n_feat,
                            offset=off).reshape(n_samples, n_feat)
        data = (raw.astype(np.float32)) / np.float32(32767.0)
    else:
        data = np.frombuffer(buf, dtype=">f4",
                             count=n_samples * n_feat,
                             offset=off).reshape(n_samples, n_feat)
        data = np.ascontiguousarray(data).astype(np.float32)
    header = {"n_samples": n_samples, "samp_period": samp_period,
              "n_features": n_feat, "kind": kind,
              "qualifiers": "".join(sorted(quals))}
    return data, header


def write_htk(path: str, data: np.ndarray, *, samp_period: int = 100_000,
              parm_kind: int = PARM_USER) -> None:
    """Write float32 frames as a plain (uncompressed float) HTK file."""
    d = np.ascontiguousarray(np.asarray(data, dtype=np.float32))
    if d.ndim != 2:
        raise ValueError("data must be [n_samples, n_features]")
    n, f = d.shape
    with open(path, "wb") as fh:
        fh.write(struct.pack(">iihh", n, samp_period, 4 * f, parm_kind))
        fh.write(d.astype(">f4").tobytes())


def write_htk_compressed(path: str, data: np.ndarray, *,
                         samp_period: int = 100_000,
                         parm_kind: int = PARM_MFCC) -> None:
    """Write frames in HTK ``_C`` compressed form (HTK Book §5.10:
    A = 2·I/(max−min), B = (max+min)·I/(max−min), x_int16 = A·x − B)."""
    d = np.asarray(data, dtype=np.float64)
    n, f = d.shape
    lo, hi = d.min(axis=0), d.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    a = 2.0 * 32767.0 / span
    b = (hi + lo) * 32767.0 / span
    q = np.clip(np.rint(d * a - b), -32768, 32767).astype(">i2")
    with open(path, "wb") as fh:
        fh.write(struct.pack(">iihh", n + 4, samp_period, 2 * f,
                             parm_kind | 0o2000))
        fh.write(a.astype(">f4").tobytes())
        fh.write(b.astype(">f4").tobytes())
        fh.write(q.tobytes())


def _parse_batch(batch: pa.Table) -> pa.Table:
    utts, frames, feats, offsets = [], [], [], [0]
    periods, kinds = [], []
    paths = batch.column("path").to_pylist()
    for i, buf in enumerate(batch.column("bytes")):
        data, hdr = decode_htk(buf.as_py())
        utt = os.path.splitext(os.path.basename(paths[i]))[0]
        n = data.shape[0]
        utts.extend([utt] * n)
        periods.extend([hdr["samp_period"]] * n)
        kinds.extend([hdr["kind"]] * n)
        frames.append(np.arange(n, dtype=np.int32))
        feats.append(data.reshape(-1))
        offsets.extend((offsets[-1] + data.shape[1]
                        * np.arange(1, n + 1, dtype=np.int64)).tolist())
    values = (np.concatenate(feats) if feats
              else np.zeros(0, dtype=np.float32))
    feat_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(values, type=pa.float32()))
    return pa.table({
        "utt": pa.array(utts, type=pa.string()),
        "frame": pa.array(np.concatenate(frames) if frames
                          else np.zeros(0, np.int32), type=pa.int32()),
        "feat": feat_arr,
        "samp_period": pa.array(periods, type=pa.int32()),
        "kind": pa.array(kinds, type=pa.string()),
    })


def read_htk(paths: list[str] | str, *, meta_columns: bool = False):
    """Distributed HTK reader: paths/dirs → Dataset of
    ``(utt, frame, feat list<float32>[, samp_period, kind])``."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    out = ds.map_batches(_parse_batch, batch_format="pyarrow")
    return out if meta_columns else out.select_columns(
        ["utt", "frame", "feat"])
