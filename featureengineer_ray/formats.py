"""Pluggable columnar formats beyond Parquet/CSV/JSON (S9 — the
reference's pluggable reader surface, ``jyh/Utils.py:22-168``): ORC and
Feather (Arrow IPC) as first-class distributed sources and sinks.

Ray Data 2.49 ships no ORC/Feather reader, so both are built on the
same fan-out the HTK codec uses (``htk.py``): ``read_binary_files``
streams paths → tasks with Ray's own parallelism/locality, and each
task decodes its files with the pyarrow C++ reader (zero Python per
row). The sinks write ONE file per incoming block from inside plain
map tasks — no driver materialization, names content-hashed so a
re-run overwrites identical bytes instead of duplicating (the same
idempotence contract as ``lineage``'s markers).

Column pruning: ORC's reader takes ``columns=`` natively (stripe-level
projection); the Feather reader prunes after the IPC mmap-decode (IPC
has no row-group projection — it is the fast-interchange format, not
the scan format; document the tradeoff, don't hide it).
"""

from __future__ import annotations

import hashlib
import io
import os

import pyarrow as pa


def _hash_name(buf: bytes, ext: str) -> str:
    return hashlib.sha1(buf).hexdigest()[:16] + ext


def write_orc_dataset(ds, out_dir: str) -> list[str]:
    """Distributed ORC sink: one ``.orc`` file per block, written from
    inside map tasks; returns the manifest (paths) — O(files), never
    rows, reaches the driver."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        sink = io.BytesIO()
        orc.write_table(batch, sink)
        buf = sink.getvalue()
        path = os.path.join(out_dir, _hash_name(buf, ".orc"))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    manifest = ds.map_batches(write_block,
                              batch_format="pyarrow").take_all()
    return sorted(r["path"] for r in manifest)


def read_orc(paths: list[str] | str, *, columns: list[str] | None = None):
    """Distributed ORC source: ``read_binary_files`` fan-out, each task
    decodes with the pyarrow ORC C++ reader (``columns=`` prunes at the
    stripe level before anything is materialized)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tables = []
        for buf in batch.column("bytes").to_pylist():
            tables.append(orc.ORCFile(pa.BufferReader(buf)).read(
                columns=columns))
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(parse, batch_format="pyarrow")


def write_feather_dataset(ds, out_dir: str,
                          compression: str = "zstd") -> list[str]:
    """Distributed Feather-v2 (Arrow IPC) sink: one ``.feather`` per
    block from inside map tasks; content-hashed idempotent names."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as fe

        sink = io.BytesIO()
        fe.write_feather(batch, sink, compression=compression)
        buf = sink.getvalue()
        path = os.path.join(out_dir, _hash_name(buf, ".feather"))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    manifest = ds.map_batches(write_block,
                              batch_format="pyarrow").take_all()
    return sorted(r["path"] for r in manifest)


def read_feather(paths: list[str] | str, *,
                 columns: list[str] | None = None):
    """Distributed Feather/IPC source: fan-out + pyarrow C++ IPC
    decode. Column selection applies AFTER the per-file decode (IPC
    carries no projection index) — use ORC/Parquet when scans must
    prune at the storage layer."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as fe

        tables = []
        for buf in batch.column("bytes").to_pylist():
            t = fe.read_table(pa.BufferReader(buf))
            tables.append(t.select(columns) if columns else t)
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(parse, batch_format="pyarrow")


def read_parquet_evolved(paths: list[str] | str, *,
                         columns: list[str] | None = None):
    """Schema-evolution parquet reader: files written at different
    schema versions (columns added over time) read as ONE dataset on
    the UNION schema — missing columns surface as typed nulls, the
    lakehouse read contract Ray's stock reader refuses (it samples one
    footer and chokes on heterogeneous blocks).

    The union schema comes from O(files) footer reads on the driver
    (metadata only — no data bytes); the data itself streams through
    the same ``read_binary_files`` fan-out as the other codecs here,
    each task decoding + aligning its files with the pyarrow C++
    reader. First-writer wins on a column's type; a file whose column
    type conflicts raises in the task rather than silently casting."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    files: list[str] = []
    for p in (paths if isinstance(paths, list) else [paths]):
        if os.path.isdir(p):
            files += sorted(glob.glob(os.path.join(p, "*.parquet")))
        else:
            files.append(p)
    fields: dict[str, pa.DataType] = {}
    for f in files:
        for fld in pq.read_schema(f):
            if fld.name in fields and fields[fld.name] != fld.type:
                raise TypeError(
                    f"column {fld.name!r} changes type across files: "
                    f"{fields[fld.name]} vs {fld.type} ({f})")
            fields.setdefault(fld.name, fld.type)
    names = [n for n in fields if columns is None or n in columns]

    ds = rd.read_binary_files(files, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch.column("bytes").to_pylist():
            t = pq.read_table(pa.BufferReader(buf))
            cols = {}
            for n in names:
                if n in t.column_names:
                    cols[n] = t.column(n)
                else:
                    cols[n] = pa.nulls(t.num_rows, type=fields[n])
            tables.append(pa.table(cols))
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(parse, batch_format="pyarrow")
