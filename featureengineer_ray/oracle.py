"""Row-at-a-time reference oracle (SURVEY.md §5, FIXTURES.md §5).

Implements the exact operator semantics the engine must reproduce —
as-of join, lag/lead, rolling (row- and time-based), forward/backward fill,
sessionize, exact dedup, per-entity z-score — as deliberately naive
per-entity Python loops over pandas frames. The engine's vectorized
partition kernels are tested for equality against this module.

Pinned semantics (SURVEY.md §7.6 "non-standard semantics"):

- **as-of**: backward match — the latest event with ``ts <= as_of_ts``
  (engine analog of the reference's ``cep[start:stop]`` point-in-time cut,
  ``IVector.py:796-800``). Optional ``tolerance``: no match unless
  ``as_of_ts - ts <= tolerance``. Ties on ``ts`` resolved by the greatest
  ``tiebreak`` value (last in sort order).
- **lag/lead k**: k-th previous / next event within the entity, ordered by
  ``(ts, tiebreak)``; null when fewer exist.
- **rolling (rows)**: trailing window of up to ``w`` rows including the
  current one; ``std`` is the sample std (ddof=1, matching SQL STDDEV),
  null when fewer than 2 non-null values.
- **rolling (time)**: all rows with ``ts in [ts_i - W, ts_i]`` including
  peers with equal ``ts`` (RANGE semantics, matching SQL windows).
- **ffill/bfill**: last/next non-null within the entity; never crosses
  entity boundaries. bfill reads the future → excluded from as-of outputs.
- **sessionize**: a new session starts when ``ts - prev_ts > gap``
  (strictly greater) or at the entity's first event. ``session_idx`` is
  1-based per entity; ``session_event_idx`` 1-based within session.
- **dedup**: first occurrence wins in ``(ts, tiebreak)`` order — reference
  keeps first (``PrepareData.py:647-658``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _sorted_groups(df: pd.DataFrame, key: str, ts: str, tiebreak: str | None):
    sort_cols = [key, ts] + ([tiebreak] if tiebreak else [])
    s = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    for _, g in s.groupby(key, sort=True):
        yield g.reset_index(drop=True)


def oracle_asof_join(
    spine: pd.DataFrame,
    events: pd.DataFrame,
    key: str,
    ts: str,
    as_of_ts: str,
    value_cols: list[str],
    tolerance=None,
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """One output row per spine row; matched event columns or nulls."""
    sort_cols = [ts] + ([tiebreak] if tiebreak else [])
    by_key = {
        k: g.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        for k, g in events.groupby(key, sort=False)
    }
    out_rows = []
    for _, srow in spine.iterrows():
        rec = dict(srow)
        match = None
        g = by_key.get(srow[key])
        if g is not None:
            for i in range(len(g)):  # linear scan — naive on purpose
                if g[ts].iloc[i] <= srow[as_of_ts]:
                    match = i
                else:
                    break
            if match is not None and tolerance is not None:
                if srow[as_of_ts] - g[ts].iloc[match] > tolerance:
                    match = None
        for c in value_cols + [ts]:
            name = f"matched_{c}" if c == ts else c
            rec[name] = g[c].iloc[match] if match is not None else None
        out_rows.append(rec)
    return pd.DataFrame(out_rows)


def oracle_lag_lead(
    df: pd.DataFrame, key: str, ts: str, col: str, lags: list[int],
    leads: list[int], tiebreak: str | None = None,
) -> pd.DataFrame:
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        for k in lags:
            vals = [g[col].iloc[i - k] if i - k >= 0 else None for i in range(len(g))]
            g[f"{col}_lag_{k}"] = vals
        for k in leads:
            vals = [g[col].iloc[i + k] if i + k < len(g) else None for i in range(len(g))]
            g[f"{col}_lead_{k}"] = vals
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def oracle_rolling_rows(
    df: pd.DataFrame, key: str, ts: str, col: str, window: int,
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """Adds {col}_roll_{mean,sum,min,max,std,count}_{window}."""
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        means, sums, mins, maxs, stds, counts = [], [], [], [], [], []
        for i in range(len(g)):
            lo = max(0, i - window + 1)
            vals = [v for v in g[col].iloc[lo : i + 1] if v is not None and not (
                isinstance(v, float) and math.isnan(v))]
            counts.append(len(vals))
            if vals:
                sums.append(float(np.sum(vals)))
                means.append(float(np.mean(vals)))
                mins.append(float(np.min(vals)))
                maxs.append(float(np.max(vals)))
            else:
                sums.append(None); means.append(None)
                mins.append(None); maxs.append(None)
            stds.append(float(np.std(vals, ddof=1)) if len(vals) >= 2 else None)
        g[f"{col}_roll_sum_{window}"] = sums
        g[f"{col}_roll_mean_{window}"] = means
        g[f"{col}_roll_min_{window}"] = mins
        g[f"{col}_roll_max_{window}"] = maxs
        g[f"{col}_roll_std_{window}"] = stds
        g[f"{col}_roll_count_{window}"] = counts
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def oracle_rolling_time(
    df: pd.DataFrame, key: str, ts: str, col: str, window_us: int,
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """Adds {col}_troll_{sum,mean,min,max,std,count} over [ts-W, ts]
    incl. equal-ts peers (std is sample, ddof=1)."""
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        tvals = g[ts].astype("int64").tolist()
        res = {s: [] for s in ("sum", "mean", "min", "max", "std",
                               "count")}
        for i in range(len(g)):
            vals = []
            for j in range(len(g)):
                if tvals[i] - window_us <= tvals[j] <= tvals[i]:
                    v = g[col].iloc[j]
                    if v is not None and not (isinstance(v, float)
                                              and math.isnan(v)):
                        vals.append(float(v))
            cnt = len(vals)
            res["count"].append(cnt)
            res["sum"].append(sum(vals) if cnt else None)
            res["mean"].append(sum(vals) / cnt if cnt else None)
            res["min"].append(min(vals) if cnt else None)
            res["max"].append(max(vals) if cnt else None)
            if cnt >= 2:
                m = sum(vals) / cnt
                res["std"].append(math.sqrt(
                    sum((v - m) ** 2 for v in vals) / (cnt - 1)))
            else:
                res["std"].append(None)
        for s, v in res.items():
            g[f"{col}_troll_{s}"] = v
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def oracle_fill(
    df: pd.DataFrame, key: str, ts: str, col: str, tiebreak: str | None = None,
) -> pd.DataFrame:
    """Adds {col}_ffill and {col}_bfill (per entity, ordered)."""
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        def _is_null(v):
            return v is None or (isinstance(v, float) and math.isnan(v))
        ff, last = [], None
        for v in g[col]:
            if not _is_null(v):
                last = v
            ff.append(last)
        bf, nxt = [None] * len(g), None
        for i in range(len(g) - 1, -1, -1):
            v = g[col].iloc[i]
            if not _is_null(v):
                nxt = v
            bf[i] = nxt
        g[f"{col}_ffill"] = ff
        g[f"{col}_bfill"] = bf
        outs.append(g)
    # drop empty frames before concat: pandas deprecated letting all-NA
    # frames participate in result-dtype inference
    outs = [o for o in outs if len(o)] or outs[:1]
    return pd.concat(outs, ignore_index=True)


def oracle_sessionize(
    df: pd.DataFrame, key: str, ts: str, gap_us: int, tiebreak: str | None = None,
) -> pd.DataFrame:
    """Adds session_idx (1-based per entity), session_event_idx, session_len."""
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        tvals = g[ts].astype("int64").tolist()
        sidx, seidx = [], []
        cur, within = 0, 0
        for i in range(len(g)):
            if i == 0 or tvals[i] - tvals[i - 1] > gap_us:
                cur += 1
                within = 1
            else:
                within += 1
            sidx.append(cur)
            seidx.append(within)
        g["session_idx"] = sidx
        g["session_event_idx"] = seidx
        lens = pd.Series(sidx).value_counts().to_dict()
        g["session_len"] = [lens[s] for s in sidx]
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def oracle_dedup_first(
    df: pd.DataFrame, keys: list[str], order: list[str]
) -> pd.DataFrame:
    """Keep the first row per key combination in `order` sort order."""
    s = df.sort_values(order, kind="stable")
    return s.drop_duplicates(subset=keys, keep="first").reset_index(drop=True)


def oracle_expanding_zscore(
    df: pd.DataFrame, key: str, ts: str, col: str,
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """Adds {col}_ez = (x_i - mean(prefix))/std(prefix, ddof=1) where the
    prefix is the entity's rows up to AND including i in (ts, tiebreak)
    order — the leak-free trailing z (only past data)."""
    outs = []
    for g in _sorted_groups(df, key, ts, tiebreak):
        g = g.copy()
        ez = []
        for i in range(len(g)):
            v = g[col].iloc[i]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                ez.append(None)
                continue
            prefix = [x for x in g[col].iloc[: i + 1]
                      if x is not None and not (
                          isinstance(x, float) and math.isnan(x))]
            if len(prefix) < 2:
                ez.append(None)
                continue
            s = float(np.std(prefix, ddof=1))
            if s == 0.0 or math.isnan(s):
                ez.append(None)
            else:
                ez.append((float(v) - float(np.mean(prefix))) / s)
        g[f"{col}_ez"] = ez
        outs.append(g)
    return pd.concat(outs, ignore_index=True)


def oracle_zscore(
    df: pd.DataFrame, key: str, col: str
) -> pd.DataFrame:
    """Adds {col}_z = (x - mean)/std(ddof=1) over the entity's own rows
    (CMVN analog, IVector.py:508-514). Null when std is 0/undefined."""
    out = df.copy()
    zs = []
    stats = {
        k: (g[col].mean(), g[col].std(ddof=1))
        for k, g in df.groupby(key, sort=False)
    }
    for _, row in df.iterrows():
        m, s = stats[row[key]]
        if s is None or (isinstance(s, float) and (math.isnan(s) or s == 0.0)):
            zs.append(None)
        else:
            zs.append((row[col] - m) / s)
    out[f"{col}_z"] = zs
    return out
