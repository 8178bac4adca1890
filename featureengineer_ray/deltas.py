"""Delta / double-delta features over per-entity ordered sequences.

The reference's feature server exposes delta and double-delta
computation as load-time options (``IVector.py:256-266``: ``delta=``,
``double_delta=`` feeding ``sidekit.FeaturesServer``; default off, cmvn
is the active normalization). The public regression formula (HTK book /
sidekit ``compute_delta``) over a window of ±K neighbors:

    delta[t] = sum_{k=1..K} k * (x[t+k] - x[t-k]) / (2 * sum_{k=1..K} k^2)

with edge frames clamped to the sequence bounds (x[t+k] saturates at the
entity's last row, x[t-k] at its first — sidekit's repeat-padding).
Double delta = the same operator applied to the delta sequence.

Ray Data shape: a partition-local vectorized kernel over the engine's
``SortedPartition`` (one clamped gather per k — no Python row loop),
composed per entity exactly like lag/lead (M4). NaN inputs propagate
through the affected windows, matching a naive per-row evaluation.
"""

from __future__ import annotations

import numpy as np

from .kernels import SortedPartition


def delta(part: SortedPartition, x: np.ndarray, k: int = 2) -> np.ndarray:
    """Regression delta over ±k rows within each entity segment (clamped
    at segment edges). x is float64 in SORTED order; returns float64."""
    if k < 1:
        raise ValueError("delta window k must be >= 1")
    n = part.n
    if n == 0:
        return np.zeros(0)
    i = np.arange(n, dtype=np.int64)
    lo = part.row_seg_start
    hi = part.row_seg_end - 1
    num = np.zeros(n)
    for j in range(1, k + 1):
        fwd = np.minimum(i + j, hi)
        back = np.maximum(i - j, lo)
        num += j * (x[fwd] - x[back])
    denom = 2.0 * sum(j * j for j in range(1, k + 1))
    return num / denom


def double_delta(part: SortedPartition, x: np.ndarray,
                 k: int = 2) -> np.ndarray:
    """delta(delta(x)) — acceleration features."""
    return delta(part, delta(part, x, k), k)
