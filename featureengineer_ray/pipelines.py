"""Flagship pipelines composed from the engine operators.

`token_feature_stack` is the end-to-end shape of the north rule: a Parquet
corpus of pre-tokenized training sequences (doc_id, tokens:list<int32>,
n_tok, source) keyed by entity with a derived ingestion timestamp, pushed
through dedup + windowed features + point-in-time as-of join in ONE
explicit range-partitioned shuffle.

For the driver's testdata (which ships raw documents, not token tables),
the corpus is built on the fly: deterministic hash tokenization →
fixed-size chunk explosion (one row per 64-token chunk = one ingestion
event per entity) → per-row derived ts. On a real token-table input
(datagen.write_corpus or any table of the input_hint shape), skip
`documents_to_token_events` and feed the table straight to
`run_token_stack`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import engine
from .datagen import DELTA_US, EPOCH_US, JITTER_US, SESSION_GAP_US
from .hashing import hash_str_array, mix64, uniform_from_hash
from .text import Tokenizer

CHUNK = 64


def _derive_ts(doc_ids: np.ndarray, seq: np.ndarray, seed: int = 42) -> np.ndarray:
    """ts = EPOCH + seq*Δ + hash(doc, seq) % J — identical to datagen."""
    dh = hash_str_array(doc_ids, seed=seed)
    jit = uniform_from_hash(mix64(dh, seq.astype(np.uint64), 0x75), JITTER_US)
    return EPOCH_US + seq * DELTA_US + jit


def documents_to_token_events(docs_ds, *, text_col: str = "text",
                              id_col: str = "doc_id", chunk: int = CHUNK):
    """documents → token-event table of the input_hint shape (+ ts).

    Tokenize (actor pool), then explode each doc's token list into
    `chunk`-token events: (doc_id, event_seq, ts, tokens, n_tok, source).
    """
    tokenized = docs_ds.map_batches(
        Tokenizer, batch_format="pyarrow", fn_constructor_kwargs={
            "text_col": text_col}, concurrency=(1, 8))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        src = (batch.column("source").to_numpy(zero_copy_only=False)
               if "source" in batch.column_names
               else np.array(["doc"] * batch.num_rows, dtype=object))
        toks = batch.column("tokens")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        values = toks.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        n_chunks = np.maximum(1, (lens + chunk - 1) // chunk).astype(np.int64)
        row_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_chunks)
        # event_seq within each doc
        firsts = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
        seq = np.arange(len(row_of), dtype=np.int64) - firsts[row_of]
        starts = offsets[row_of] + seq * chunk
        ends = np.minimum(starts + chunk, offsets[row_of] + lens[row_of])
        clens = np.maximum(ends - starts, 0)
        new_off = np.zeros(len(row_of) + 1, dtype=np.int64)
        np.cumsum(clens, out=new_off[1:])
        gather = np.concatenate(
            [np.arange(s, e) for s, e in zip(starts, ends)]
        ) if len(starts) else np.zeros(0, dtype=np.int64)
        flat = values[gather].astype(np.int32) if len(gather) else np.zeros(
            0, dtype=np.int32)
        doc_ids = ids[row_of].astype(str).astype(object)
        ts = _derive_ts(doc_ids, seq)
        tokens = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int64()).cast(pa.int32()),
            pa.array(flat, type=pa.int32()))
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "event_seq": pa.array(seq),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "tokens": tokens,
            "n_tok": pa.array(clens.astype(np.int32)),
            "source": pa.array(src[row_of], type=pa.string()),
        })

    return tokenized.map_batches(explode, batch_format="pyarrow")


def featurize_tokens(batch: pa.Table) -> pa.Table:
    """Per-event token-content features (reference M1 analog — the
    per-record featurize over the sequence): 64-bit content fingerprint
    (order-sensitive mix), min/max/sum token ids. Fully vectorized over
    the flat token stream via segment reduceat."""
    toks = batch.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    n = batch.num_rows
    starts = offsets[:-1]
    lens = np.diff(offsets)
    if len(values):
        pos = np.arange(len(values), dtype=np.int64)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        within = (pos - offsets[row_of]).astype(np.uint64)
        mixed = mix64(values.astype(np.uint64), within)
        # segment reduce via reduceat; empty segments clamped + overwritten
        starts = np.minimum(starts, max(len(values) - 1, 0))
        fp = np.bitwise_xor.reduceat(mixed, starts)
        tok_min = np.minimum.reduceat(values, starts)
        tok_max = np.maximum.reduceat(values, starts)
        tok_sum = np.add.reduceat(values, starts)
        empty = lens == 0
        if empty.any():
            fp[empty] = 0
            tok_min[empty] = 0
            tok_max[empty] = 0
            tok_sum[empty] = 0
    else:
        fp = np.zeros(n, dtype=np.uint64)
        tok_min = tok_max = tok_sum = np.zeros(n, dtype=np.int64)
    out = batch.append_column("tok_fp", pa.array(fp.view(np.int64)))
    out = out.append_column("tok_min", pa.array(tok_min.astype(np.int64)))
    out = out.append_column("tok_max", pa.array(tok_max.astype(np.int64)))
    out = out.append_column("tok_sum", pa.array(tok_sum.astype(np.int64)))
    return out


def last_chunk_spine(events_ds):
    """Spine: one as-of request per (entity, chunk boundary sample) — the
    exact ts of every 4th event plus one past-the-end probe per entity."""

    def mk(batch: pa.Table) -> pa.Table:
        seq = batch.column("event_seq").to_numpy(zero_copy_only=False)
        keep = (seq % 4) == 0
        b = batch.filter(pa.array(keep))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "as_of_ts": b.column("ts"),
            "spine_seq": b.column("event_seq"),
        })

    return events_ds.map_batches(mk, batch_format="pyarrow")


def default_spec() -> engine.WindowSpec:
    return engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2, 3]},
        rolling={"n_tok": [8]},
        session_gap_us=int(SESSION_GAP_US),
        zscore=["n_tok"],
        expanding_zscore=["n_tok"],
    )


def run_token_stack(events_ds, spine_ds=None, spec: engine.WindowSpec | None = None,
                    late_materialize: bool = False,
                    payload_paths: list[str] | None = None, **plan_kwargs):
    """dedup + windowed features + as-of join (the flagship).

    Hot entities are sub-split into time-contiguous ranges by default
    (exact via splitstate's boundary corrections) — the Zipf head entity
    would otherwise serialize the whole pipeline on one partition.

    ``late_materialize`` routes token payloads around the all-to-all
    (narrow stack + exact locator-join attach under the same plan,
    engine.feature_stack_late) — ~4× fewer shuffled bytes, the right
    trade on a multi-node cluster where the exchange crosses the network.
    On this single-node sandbox the push-based shuffle moves local bytes
    faster than the extra phase costs, so eager is the default
    (measured: late 25s vs eager 19s at 32 cpus on the 4M corpus)."""
    spec = spec or default_spec()
    spine_ds = spine_ds if spine_ds is not None else last_chunk_spine(events_ds)
    plan_kwargs.setdefault("split_hot_keys", True)
    # (featurize_tokens can be chained in front for token-content features;
    # it costs a full extra pass over the payload bytes, so the default
    # flagship leaves it off)
    value_cols = ["tokens", "n_tok", "event_seq"]
    if late_materialize:
        return engine.feature_stack_late(
            events_ds, spine_ds, spec, payload_cols=["tokens"],
            value_cols=value_cols, dedup=True,
            payload_paths=payload_paths, **plan_kwargs)
    return engine.feature_stack(
        events_ds, spine_ds, spec, value_cols=value_cols, dedup=True,
        **plan_kwargs)


def token_feature_stack(sf_dir: str):
    """documents.parquet → token events → flagship stack (driver entry)."""
    import ray.data as rd

    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    events = documents_to_token_events(docs)
    return run_token_stack(events)


def curate_corpus(docs, bench_texts, *, id_col: str = "doc_id",
                  text_col: str = "text",
                  contam_threshold: float = 0.5,
                  jaccard_threshold: float = 0.5):
    """End-to-end LLM corpus curation: Gopher quality filter →
    benchmark decontamination → near-duplicate cluster dedup.

    Every stage streams: quality and contamination are vectorized
    map_batches with broadcast reference sets; dedup moves only
    signatures/pairs (see SCALE.md). Returns the surviving documents
    with their quality/contamination measures attached."""
    import pyarrow.compute as pc

    from . import dedup as dd
    from . import text

    q = docs.map_batches(text.quality_flags_batch,
                         batch_format="pyarrow")
    q = q.filter(expr="pass_gopher == 1")
    c = text.contamination_ratio(q, bench_texts, id_col=id_col,
                                 text_col=text_col)
    c = c.map_batches(
        lambda b: b.filter(pc.less_equal(b.column("contam_ratio"),
                                         contam_threshold)),
        batch_format="pyarrow")
    return dd.near_dup_dedup(c, id_col=id_col, text_col=text_col,
                             threshold=jaccard_threshold)
