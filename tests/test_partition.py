"""Planning-scan partials: the distributed per-key combine must fold
(key, batch) sample partials exactly — aggregates summed/folded and the
bottom-k-by-hash sketch selection preserved — so the driver sees the
same evidence it did when it pulled every raw partial."""

import numpy as np
import pyarrow as pa

from featureengineer_ray.partition import (SKETCH_MERGE_CAP,
                                           _merge_sample_partials)


def _partial_table(rows):
    """rows: list of (key, n, lo, hi, ts_list, h_list)."""
    offs = np.concatenate(([0], np.cumsum([len(r[4]) for r in rows])))
    return pa.table({
        "key": pa.array([r[0] for r in rows]),
        "n": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts_lo": pa.array([r[2] for r in rows], type=pa.int64()),
        "ts_hi": pa.array([r[3] for r in rows], type=pa.int64()),
        "ts_sketch": pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(np.concatenate([r[4] for r in rows]).astype(np.int64))),
        "h_sketch": pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(np.concatenate([r[5] for r in rows])
                     .astype(np.uint64).view(np.int64))),
        "__part": pa.array([0] * len(rows), type=pa.int32()),
    })


def test_merge_sample_partials_exact():
    rng = np.random.default_rng(3)
    # three keys spread over several "batches"; key b exceeds the cap
    rows = []
    expect = {}
    for key, n_parts, per in [("a", 3, 40), ("b", 30, 64), ("c", 1, 5)]:
        all_ts, all_h = [], []
        for i in range(n_parts):
            ts = rng.integers(0, 10**9, size=per)
            h = rng.integers(0, 2**63, size=per).astype(np.uint64)
            rows.append((key, per + i, int(ts.min()), int(ts.max()), ts, h))
            all_ts.append(ts)
            all_h.append(h)
        ts = np.concatenate(all_ts)
        h = np.concatenate(all_h)
        k = min(len(h), SKETCH_MERGE_CAP)
        sel = np.argsort(h, kind="stable")[:k]
        expect[key] = {
            "n": sum(per + i for i in range(n_parts)),
            "lo": int(ts.min()), "hi": int(ts.max()),
            "pairs": set(zip(h[sel].tolist(), ts[sel].tolist())),
        }
    rng.shuffle(rows)
    out = _merge_sample_partials(_partial_table(rows))
    assert out.num_rows == 3
    for i in range(out.num_rows):
        key = out.column("key")[i].as_py()
        e = expect[key]
        assert out.column("n")[i].as_py() == e["n"]
        assert out.column("ts_lo")[i].as_py() == e["lo"]
        assert out.column("ts_hi")[i].as_py() == e["hi"]
        got_ts = np.asarray(out.column("ts_sketch")[i].as_py())
        got_h = np.asarray(out.column("h_sketch")[i].as_py()).astype(
            np.int64).view(np.uint64)
        assert len(got_ts) == len(e["pairs"])
        assert set(zip(got_h.tolist(), got_ts.tolist())) == e["pairs"]


def test_zorder_key_interleaves_bits():
    """Morton fold == the naive per-bit interleave on random inputs;
    keys are non-negative and monotone in each dimension within a
    fixed other-dimension prefix."""
    import numpy as np

    from featureengineer_ray.partition import zorder_key

    rng = np.random.default_rng(53)
    a = rng.integers(0, 2**31, 200, dtype=np.int64)
    b = rng.integers(0, 2**31, 200, dtype=np.int64)
    got = zorder_key(a, b)
    assert (got >= 0).all()
    for i in range(200):
        want = 0
        for bit in range(31):
            want |= ((int(a[i]) >> bit) & 1) << (2 * bit)
            want |= ((int(b[i]) >> bit) & 1) << (2 * bit + 1)
        assert int(got[i]) == want
    # locality: equal high bits of both dims -> equal key prefix
    k1 = zorder_key(np.array([0b1010 << 20]), np.array([0b1100 << 20]))
    k2 = zorder_key(np.array([(0b1010 << 20) + 7]),
                    np.array([(0b1100 << 20) + 3]))
    assert (int(k1[0]) >> 48) == (int(k2[0]) >> 48)
