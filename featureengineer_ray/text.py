"""Text analysis for training-data pipelines: tokenization, language-ID,
quality scoring, document fingerprinting.

Stateful pieces (compiled regexes, stopword tables) live in actor-pool
callables' ``__init__`` (reference analog: FeaturesServer template state,
``IVector.py:247-268``). All per-batch work is vectorized: pyarrow.compute
string kernels where possible, numpy over dictionary-encoded uniques
otherwise.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_str_array, mix64, splitmix64, uniform_from_hash

WORD_RE = r"[A-Za-z0-9]+"
VOCAB = 50_257

# tiny per-language stopword profiles (public-knowledge common words)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "une", "que", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "una", "que", "por", "con"},
}


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """SQL-parity text stats: token_count (regex [A-Za-z0-9]+ matches),
    n_chars, n_spaces, upper_ratio — all pyarrow.compute kernels."""
    txt = batch.column(text_col)
    token_count = pc.count_substring_regex(txt, WORD_RE)
    n_chars = pc.utf8_length(txt)
    n_spaces = pc.count_substring(txt, " ")
    out = batch.append_column("token_count", token_count.cast(pa.int64()))
    out = out.append_column("n_chars_computed", n_chars.cast(pa.int64()))
    out = out.append_column("n_spaces", n_spaces.cast(pa.int64()))
    return out


class Tokenizer:
    """Deterministic hash 'BPE-ish' tokenizer: regex words + punct pieces →
    stable int32 ids via BLAKE2 of the piece (O(unique pieces) per batch).

    Actor-pool stage: compile in __init__, vectorize in __call__ —
    the T1/T4 actor shape from SURVEY.md §2.3.
    """

    def __init__(self, text_col: str = "text", vocab: int = VOCAB,
                 seed: int = 42, max_tokens: int | None = None):
        self.re = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")
        self.text_col = text_col
        self.vocab = vocab
        self.seed = seed
        self.max_tokens = max_tokens

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        pieces_per_doc = [self.re.findall(t.lower()) for t in texts]
        lens = np.array([len(p) for p in pieces_per_doc], dtype=np.int64)
        if self.max_tokens is not None:
            lens = np.minimum(lens, self.max_tokens)
            pieces_per_doc = [p[:self.max_tokens] for p in pieces_per_doc]
        flat = np.array(
            [w for p in pieces_per_doc for w in p], dtype=object)
        if len(flat):
            ids = (hash_str_array(flat, seed=self.seed)
                   % np.uint64(self.vocab)).astype(np.int32)
        else:
            ids = np.zeros(0, dtype=np.int32)
        offsets = np.zeros(len(texts) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids))
        out = batch.append_column("tokens", tokens)
        out = out.append_column("n_tok", pa.array(lens.astype(np.int32)))
        return out


class LangIdQuality:
    """Heuristic language-ID + quality scoring (actor-pool stage).

    lang_pred: argmax stopword-profile hit-rate (ties → 'und').
    quality: mean of [len score, alpha ratio, stopword ratio bounded,
    mean word len score] in [0,1] — the M2/VAD-style per-record predicate
    surface, re-expressed for text."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-z]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        langs, quals = [], []
        for t in texts:
            lt = t.lower()
            words = self.word.findall(lt)
            nw = max(1, len(words))
            scores = {
                lang: sum(1 for w in words if w in prof) / nw
                for lang, prof in self.profiles.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0.02 else "und")
            n_alpha = sum(len(w) for w in words)
            alpha_ratio = n_alpha / max(1, len(t))
            stop_ratio = scores[best]
            len_score = min(1.0, len(t) / 500.0)
            mwl = n_alpha / nw
            mwl_score = 1.0 - min(1.0, abs(mwl - 5.0) / 5.0)
            quals.append(
                (len_score + min(1.0, alpha_ratio * 1.25)
                 + min(1.0, stop_ratio * 5.0) + mwl_score) / 4.0)
        out = batch.append_column("lang_pred", pa.array(langs, type=pa.string()))
        out = out.append_column("quality", pa.array(quals, type=pa.float64()))
        return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      seed: int = 9) -> pa.Table:
    """64-bit rolling-hash document fingerprint (content-defined)."""
    texts = batch.column(text_col).to_numpy(zero_copy_only=False)
    fps = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        acc = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):
            # vectorized polynomial fold in chunks (Horner over 8-byte lanes)
            pad = (-len(b)) % 8
            lanes = np.concatenate([b, np.zeros(pad, dtype=np.uint64)]).reshape(-1, 8)
            lane_vals = (lanes * (np.uint64(1) << (np.uint64(8) * np.arange(8, dtype=np.uint64)))).sum(
                axis=1, dtype=np.uint64)
            for v in splitmix64(lane_vals ^ np.uint64(seed)):
                acc = splitmix64(acc ^ v)
        fps[i] = acc
    return batch.append_column("fingerprint", pa.array(fps.astype(np.int64)))
