"""Exact boundary state for hot-entity sub-splits (skew splitting).

When the partition plan splits one hot entity into time-contiguous
sub-ranges (PartitionPlan.hot_splits), per-entity window semantics would
break at the sub boundaries. This module restores exactness with a cheap
protocol (SURVEY.md §7.6 "entity state across block boundaries"):

1. **Narrow pre-pass** over ONLY the hot-split keys' ``(key, ts [, numeric
   cols])`` columns — assigned with the same plan, summarized per sub by
   :func:`summarize_subs` (tail timestamps, session structure, fill
   carries, moments). Cost: one extra scan of a few narrow columns of the
   hot rows.
2. **Driver fold** (:func:`fold_corrections`): per sub — the exact set of
   context-row timestamps to duplicate forward (lag/rolling/as-of context
   with FULL payload, because the main shuffle re-routes the real rows),
   session-index offset, boundary-session chain totals, per-column
   forward-fill carry, and entity-global moments for z-score.
3. The main assignment duplicates rows whose ``(key, ts)`` is in the
   context set into the next sub flagged ``__ctx=1``; the split-partition
   kernel computes windows over (ctx + local) rows, applies the session
   corrections arithmetically, and drops ctx rows from the output.

Everything is exact: conformance tests force splits and compare against
the single-partition oracle, including sessions spanning 3+ subs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from .partition import PartitionPlan, assign_partition_ids

CTX_COL = "__ctx"


@dataclass
class SubCorrection:
    key: object
    sub_index: int
    ctx_ts: np.ndarray                 # int64 µs ts of rows duplicated into this sub
    session_offset: int = 0            # true sessions started before this sub
    merge: bool = False                # first real row continues prev session
    prior_rows: int = 0                # boundary-session rows before this sub
    first_total: int | None = None     # total len of session containing first row
    last_total: int | None = None      # total len of session containing last row
    prev_last_seidx: int = 0           # session_event_idx of prev sub's last row
    prev_last_slen: int = 0            # session_len of prev sub's last row's
                                       # session when that session is closed
    ffill_carry: dict = field(default_factory=dict)   # col -> float (nan if none)
    moments: dict = field(default_factory=dict)       # col -> (count, sum, sumsq)
    prefix_moments: dict = field(default_factory=dict)  # col -> (cnt,s,ssq) of SUBS BEFORE this one


def hot_split_pids(plan: PartitionPlan) -> dict[object, list[int]]:
    """key -> ordered list of its sub-partition ids."""
    out = {}
    for k, bnds in plan.hot_splits.items():
        base = plan.hot[k]
        out[k] = list(range(base, base + len(bnds) + 1))
    return out


class SummaryKernel:
    """Per-(hot key, sub) narrow summary — runs in map_groups over the
    pre-pass dataset (columns: key, ts, tiebreak?, numeric cols)."""

    def __init__(self, key: str, ts: str, tiebreak: str | None,
                 numeric_cols: list[str], gap_us: int | None,
                 ctx_cap: int = 8192, dedup: bool = False,
                 pid2key: dict[int, object] | None = None):
        self.key, self.ts, self.tiebreak = key, ts, tiebreak
        self.numeric_cols = numeric_cols
        self.gap_us = gap_us
        self.ctx_cap = ctx_cap
        self.dedup = dedup
        self.pid2key = pid2key

    def __call__(self, group: pa.Table) -> pa.Table:
        pid = group.column("__part")[0].as_py()
        g = group.drop_columns(["__part"])
        tsv = g.column(self.ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if self.tiebreak:
            tb = g.column(self.tiebreak).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            order = np.lexsort((tb, tsv))
        else:
            order = np.argsort(tsv, kind="stable")
        tsv = tsv[order]
        if self.dedup and len(tsv):
            # mirror the split kernels' first-wins (key, ts) dedup BEFORE
            # summarizing — session structure, moments and carries must be
            # computed over the surviving rows only (one key per group here)
            keep = np.ones(len(tsv), dtype=bool)
            keep[1:] = np.diff(tsv) != 0
            order = order[keep]
            tsv = tsv[keep]
        n = len(tsv)
        keyv = (self.pid2key[pid] if self.pid2key is not None
                else g.column(self.key)[0].as_py())
        if self.gap_us is not None and n:
            gaps = np.diff(tsv) > self.gap_us
            starts_local = 1 + int(gaps.sum())
            gi = np.flatnonzero(gaps)
            prefix_len = int(gi[0] + 1) if len(gi) else n
            suffix_len = int(n - 1 - gi[-1]) if len(gi) else n
        else:
            starts_local, prefix_len, suffix_len = 1, n, n
        tail = tsv[-min(n, self.ctx_cap):]
        rec = {
            "key": [keyv], "pid": [pid], "n": [n],
            "first_ts": [int(tsv[0]) if n else 0],
            "last_ts": [int(tsv[-1]) if n else 0],
            "starts_local": [starts_local],
            "prefix_len": [prefix_len], "suffix_len": [suffix_len],
            "tail_ts": [tail.tolist()],
        }
        for c in self.numeric_cols:
            x = g.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)[order]
            valid = ~np.isnan(x)
            last_valid = float(x[valid][-1]) if valid.any() else np.nan
            rec[f"lv_{c}"] = [last_valid]
            rec[f"cnt_{c}"] = [float(valid.sum())]
            rec[f"sum_{c}"] = [float(x[valid].sum())]
            rec[f"ssq_{c}"] = [float((x[valid] ** 2).sum())]
        return pa.table(rec)


def presummarize(ds, plan: PartitionPlan, *, key: str, ts: str,
                 tiebreak: str | None, numeric_cols: list[str],
                 gap_us: int | None, ctx_cap: int = 8192,
                 dedup: bool = False) -> pd.DataFrame:
    """Run the narrow pre-pass over hot-split keys; returns summaries df."""
    split_keys = set(plan.hot_splits.keys())
    cols = [key, ts] + ([tiebreak] if tiebreak else []) + numeric_cols

    def filter_assign(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = pc.is_in(col, value_set=pa.array(list(split_keys)))
        b = batch.filter(mask)
        if b.num_rows == 0:
            return b.drop_columns([key]).append_column(
                "__part", pa.array([], type=pa.int32()))
        tv = b.column(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        pid = assign_partition_ids(b.column(key), plan, tv)
        # the sub pid identifies the key (each split key owns a contiguous
        # pid range), so the key string itself need not ride the shuffle —
        # ~40% of the pre-pass exchange bytes on the default narrow set
        b = b.drop_columns([key])
        return b.append_column("__part", pa.array(pid, type=pa.int32()))

    pid2key = {pid: k for k, pids in hot_split_pids(plan).items()
               for pid in pids}
    kern = SummaryKernel(key, ts, tiebreak, numeric_cols, gap_us,
                         ctx_cap=ctx_cap, dedup=dedup, pid2key=pid2key)

    def summary_kernel(group: pa.Table) -> pa.Table:
        return kern(group)

    narrow = ds.select_columns(cols).map_batches(
        filter_assign, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(narrow)
    out = narrow.groupby("__part").map_groups(
        summary_kernel, batch_format="pyarrow")
    import os as _os
    import sys as _sys

    if _os.environ.get("FE_PHASE_TIMING") == "1":
        out = out.materialize()
        print(out.stats(), file=_sys.stderr, flush=True)
        return out.to_pandas()
    return out.to_pandas()


def fold_corrections(
    summaries: pd.DataFrame, plan: PartitionPlan, *,
    context_rows: int, gap_us: int | None,
    time_windows_us: list[int] | None = None,
) -> dict[int, SubCorrection]:
    """Driver-side fold of per-sub summaries → exact per-pid corrections."""
    out: dict[int, SubCorrection] = {}
    w_max = max(time_windows_us) if time_windows_us else 0
    for keyv, pids in hot_split_pids(plan).items():
        subs = summaries[summaries["key"] == keyv].set_index("pid")
        present = [p for p in pids if p in subs.index and subs.loc[p, "n"] > 0]
        if not present:
            continue
        num_cols = [c[3:] for c in summaries.columns if c.startswith("lv_")]
        total_cnt = {c: float(subs.loc[present, f"cnt_{c}"].sum())
                     for c in num_cols}
        total_sum = {c: float(subs.loc[present, f"sum_{c}"].sum())
                     for c in num_cols}
        total_ssq = {c: float(subs.loc[present, f"ssq_{c}"].sum())
                     for c in num_cols}
        moments = {c: (total_cnt[c], total_sum[c], total_ssq[c])
                   for c in num_cols}

        # rolling context buffer + per-col ffill carry across subs
        buf = np.zeros(0, dtype=np.int64)
        carry = {c: np.nan for c in num_cols}
        run = {c: (0.0, 0.0, 0.0) for c in num_cols}  # moments of prior subs
        s_before = 0
        chain: list[int] = []   # pids participating in the open session chain
        chain_rows = 0          # rows of the open session accumulated so far

        def close_chain(total: int):
            for q in chain:
                out[q].last_total = total
                if out[q].merge and out[q].first_total is None:
                    out[q].first_total = total

        for i, p in enumerate(present):
            row = subs.loc[p]
            merge = False
            if i > 0 and gap_us is not None:
                prev = subs.loc[present[i - 1]]
                merge = (int(row["first_ts"]) - int(prev["last_ts"])) <= gap_us
            # context rows to duplicate into this sub
            if i > 0:
                ctx = buf[-context_rows:]
                if w_max and len(buf):
                    # anchor at the last ctx ts: its own trailing time window
                    # must be covered too (it may be an as-of match target)
                    ctx = np.union1d(ctx, buf[buf >= int(buf[-1]) - w_max])
            else:
                ctx = np.zeros(0, dtype=np.int64)
            corr = SubCorrection(
                key=keyv, sub_index=i, ctx_ts=np.sort(np.asarray(ctx, dtype=np.int64)),
                session_offset=s_before, merge=merge,
                ffill_carry=dict(carry), moments=moments,
                prefix_moments=dict(run),
            )
            out[p] = corr

            if gap_us is not None:
                n = int(row["n"])
                prefix = int(row["prefix_len"])
                suffix = int(row["suffix_len"])
                has_gap = prefix < n
                corr.prev_last_seidx = chain_rows  # prev sub's last row pos
                if not merge:
                    corr.prev_last_slen = chain_rows  # its session closed here
                    close_chain(chain_rows)
                    chain, chain_rows = [], 0
                corr.prior_rows = chain_rows if merge else 0
                if has_gap:
                    # this sub's first session closes the open chain
                    total = chain_rows + prefix
                    if merge:
                        corr.first_total = total
                    close_chain(total)
                    # its last session opens a fresh chain
                    chain, chain_rows = [p], suffix
                else:
                    # whole sub lies inside one session: extend the chain
                    chain_rows += n
                    chain.append(p)
                s_before += int(row["starts_local"]) - (1 if merge else 0)
            # fold buffers
            tail = np.asarray(row["tail_ts"], dtype=np.int64)
            keep = max(context_rows, 1)
            buf = np.concatenate([buf, tail])
            if w_max and len(buf):
                cutoff = int(buf[-1]) - w_max
                sel = (np.arange(len(buf)) >= len(buf) - keep) | (buf >= cutoff)
                buf = buf[sel]
            else:
                buf = buf[-keep:]
            for c in num_cols:
                lv = row[f"lv_{c}"]
                if not (isinstance(lv, float) and np.isnan(lv)):
                    carry[c] = float(lv)
                rc, rs, rq = run[c]
                run[c] = (rc + float(row[f"cnt_{c}"]),
                          rs + float(row[f"sum_{c}"]),
                          rq + float(row[f"ssq_{c}"]))
        if gap_us is not None:
            close_chain(chain_rows)
    return out


def build_ctx_map(corrections: dict[int, SubCorrection]) -> dict:
    """key -> (sorted ts array, matching target pid array) for assignment.

    (ts, pid) pairs are DEDUPED: without dedup the buffer may list one ts
    several times (several physical rows at that ts) — each physical row
    matching the ts must be duplicated exactly once per target sub, not
    once per buffer entry."""
    per_key: dict[object, list[tuple[int, int]]] = {}
    for pid, corr in corrections.items():
        for t in corr.ctx_ts:
            per_key.setdefault(corr.key, []).append((int(t), pid))
    out = {}
    for k, pairs in per_key.items():
        pairs = sorted(set(pairs))
        ts = np.array([p[0] for p in pairs], dtype=np.int64)
        pid = np.array([p[1] for p in pairs], dtype=np.int64)
        out[k] = (ts, pid)
    return out
