"""Driver-emulator: run every queries() entry and compare with oracle_sql()
via DuckDB (row count + schema + order-insensitive value hash).

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pdf(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            vals = np.where(col.isna(), "NaN", col.map(lambda v: f"{v:.17g}"))
        else:
            vals = col.astype(str).where(~col.isna(), "NaN")
        h.update("\x1f".join(map(str, vals)).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_raw = to_pdf(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got_raw)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        got = canon(got_raw)
        try:
            exp = canon(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL {name}: sql error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        else:
            dts_g = [str(got[c].dtype) for c in got.columns]
            dts_e = [str(exp[c].dtype) for c in exp.columns]
            if dts_g != dts_e:
                problems.append(f"dtypes {dts_g} != {dts_e}")
            hg, he = value_hash(got), value_hash(exp)
            if hg != he:
                problems.append(f"hash {hg} != {he}")
                for c in got.columns:
                    a, b = got[c], exp[c]
                    if pd.api.types.is_float_dtype(a):
                        bad = ~(np.isclose(a, b, rtol=1e-7, equal_nan=True))
                    else:
                        bad = (a.astype(str).where(~a.isna(), "NaN")
                               != b.astype(str).where(~b.isna(), "NaN"))
                    if bad.any():
                        i = int(np.flatnonzero(bad)[0])
                        problems.append(
                            f"  col {c}: {int(bad.sum())} diffs, first at "
                            f"{i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
