"""Flagship pipeline job entry — runnable directly or via `ray job submit`.

Examples:
    python scripts/run_pipeline.py --events /tmp/corpus/events \
        --spine /tmp/corpus/spine.parquet --out /tmp/out

    ray job submit --working-dir /root/repo -- \
        python scripts/run_pipeline.py --events ... --spine ... --out ...

On a cluster, omit --local to connect to the running Ray cluster
(RAY_ADDRESS); in this sandbox --local (default) starts a local session.
The run is resumable: re-invoking with the same --out skips completed
partitions via the per-partition lineage markers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--events", required=True, help="parquet dir/file of token events")
    p.add_argument("--spine", required=True, help="parquet of (doc_id, as_of_ts) requests")
    p.add_argument("--out", required=True, help="output dir (partitioned parquet + lineage)")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    p.add_argument("--local", action="store_true", default=True)
    p.add_argument("--no-split-hot-keys", action="store_true")
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local" if args.local else None,
                 num_cpus=args.num_cpus if args.local else None,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False

    import ray.data as rd

    from featureengineer_ray import lineage
    from featureengineer_ray.pipelines import default_spec, last_chunk_spine

    events = rd.read_parquet(args.events)
    spine = rd.read_parquet(args.spine) if args.spine != "auto" else \
        last_chunk_spine(events)

    t0 = time.time()
    recs = lineage.write_feature_stack(
        events, spine, default_spec(), args.out,
        value_cols=["tokens", "n_tok", "event_seq"],
        split_hot_keys=not args.no_split_hot_keys)
    wall = time.time() - t0
    rows = sum(r["rows"] for r in recs)
    print(json.dumps({
        "out": args.out, "new_partitions": len(recs), "rows_written": rows,
        "wall_sec": round(wall, 2),
        "total_done_partitions": len(lineage.done_pids(args.out)),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
