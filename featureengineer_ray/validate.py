"""Table validation: declarative row-level rules → per-rule violation
counts in ONE streaming pass (plus one narrow pass per ``unique`` rule).

The reference guards every metadata write with ``assert idmap.validate()``
(PrepareData.py:917-952) and every stat read with
``statserver.validate()`` (IVector.py:905) — an all-or-nothing driver-side
assert. At 100 TB an assert that re-scans the table per rule is wrong
twice over; here every rule is evaluated vectorized per batch and only a
(rule → count) partial leaves each task, so the full report costs one
narrow scan of exactly the referenced columns.

Rules (all null-safe: NULL fails ``not_null`` and is OTHERWISE ignored —
SQL semantics, a NULL never violates a range/set/regex rule):

- ``("not_null", col)``
- ``("between", col, lo, hi)``          — violations: value < lo or > hi
- ``("in_set", col, values)``           — violations: value not in set
- ``("matches", col, regex)``           — violations: no RE2 full match
- ``("unique", col)``                   — duplicate occurrences
  (rows − distinct values − nulls·0; distinct merged from per-batch
  unique partials, bounded by the column's distinct count — use
  sketches.approx_distinct first if distincts are web-scale)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def validate_rules(ds, rules: list[tuple]) -> pa.Table:
    """Evaluate ``rules`` over ``ds``; returns (rule, col, violations)."""
    simple = [(i, r) for i, r in enumerate(rules) if r[0] != "unique"]
    uniq_rules = [(i, r) for i, r in enumerate(rules) if r[0] == "unique"]
    counts = np.zeros(len(rules), dtype=np.int64)

    if simple:
        scols = sorted({r[1] for _, r in simple})

        def partial(batch: pa.Table) -> pa.Table:
            out = np.zeros(len(rules), dtype=np.int64)
            for i, r in simple:
                kind, col = r[0], r[1]
                arr = batch.column(col)
                if kind == "not_null":
                    out[i] = arr.null_count
                    continue
                valid = pc.is_valid(arr)
                if kind == "between":
                    bad = pc.or_(pc.less(arr, r[2]), pc.greater(arr, r[3]))
                elif kind == "in_set":
                    bad = pc.invert(pc.is_in(
                        arr, value_set=pa.array(list(r[2]))))
                elif kind == "matches":
                    bad = pc.invert(pc.match_substring_regex(
                        arr, f"^(?:{r[2]})$"))
                else:
                    raise ValueError(f"unknown rule kind {kind!r}")
                out[i] = int(pc.sum(pc.and_kleene(bad, valid)).as_py() or 0)
            return pa.table({
                "rule_idx": pa.array(np.arange(len(rules), dtype=np.int64)),
                "cnt": pa.array(out)})

        for b in ds.select_columns(scols).map_batches(
                partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            np.add.at(counts,
                      b.column("rule_idx").to_numpy(zero_copy_only=False),
                      b.column("cnt").to_numpy(zero_copy_only=False))

    for i, r in uniq_rules:
        col = r[1]

        def uniq_partial(batch: pa.Table, _col=col) -> pa.Table:
            arr = batch.column(_col)
            u = pc.unique(arr.combine_chunks() if isinstance(
                arr, pa.ChunkedArray) else arr).drop_null()
            # first element of "n" carries this batch's non-null row
            # count (an all-null/empty batch has 0 of both, still exact)
            n = np.zeros(len(u), dtype=np.int64)
            if len(n):
                n[0] = batch.num_rows - arr.null_count
            return pa.table({"v": u, "n": pa.array(n)})

        seen: set = set()
        non_null_rows = 0
        for b in ds.select_columns([col]).map_batches(
                uniq_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            non_null_rows += int(np.sum(
                b.column("n").to_numpy(zero_copy_only=False)))
            seen.update(b.column("v").to_pylist())
        counts[i] = non_null_rows - len(seen)

    return pa.table({
        "rule": pa.array([f"{r[0]}:{r[1]}" for r in rules],
                         type=pa.string()),
        "col": pa.array([r[1] for r in rules], type=pa.string()),
        "violations": pa.array(counts),
    })


def profile_columns(ds, columns: list[str]) -> "object":
    """One-pass numeric data profiling: per column, row/null counts and
    exact min/max (the dataset-summary half of the reference's
    validate() guards, computed streaming instead of via a driver
    re-scan). Each batch emits one O(columns) partial row set; one tiny
    grouped reduce merges them — the scan reads exactly ``columns``.
    Returns a Dataset of (column, n_rows, n_null, min_val, max_val)
    with values cast to float64 (selection-only stats: no arithmetic,
    so the doubles are bit-exact vs any SQL oracle)."""
    from . import relational

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mns, mxs = [], [], [], [], []
        for c in columns:
            arr = batch.column(c)
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(arr.null_count)
            if batch.num_rows > arr.null_count:
                mm = pc.min_max(arr)
                mns.append(float(mm["min"].as_py()))
                mxs.append(float(mm["max"].as_py()))
            else:
                mns.append(None)
                mxs.append(None)
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "n_rows": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
            "min_val": pa.array(mns, type=pa.float64()),
            "max_val": pa.array(mxs, type=pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return relational.grouped_agg(
        partials, ["column"],
        {"n_rows": ("n_rows", "sum"), "n_null": ("n_null", "sum"),
         "min_val": ("min_val", "min"), "max_val": ("max_val", "max")})
