"""Benchmark harness.

Runs the headline pipelines and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "headline_rows": R, "headline_rows_per_sec": X}

- input tables: $GRAFT_SF_DIR (default /root/testdata/sf0.1)
- headline: the flagship token feature stack (dedup + windowed features +
  as-of join, one shuffle) over a deterministically synthesized token-event
  corpus (datagen, seed-stable; cached parquet under /tmp)
- `--scaling`: runs the headline in TWO fresh processes at num_cpus=8 and 32
  on the same input and reports both throughputs + scaling efficiency
  (T8/T32/4 in rows/sec terms). Evidence for the N→4N criterion.
  `--scaling --cold` evicts the input from the page cache before every
  rep (first-pass-over-new-data model); the job then pays its own
  distributed prefetch inside the timed region (ioutil.prefetch_files).
- suite mode times a pinned canary query (doc_stats) FIRST and emits
  `queries_canary_ratio`: window drift moves every ratio together, a
  real regression moves one.

This script OWNS its Ray session (init/shutdown); library code never does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_ROWS = int(os.environ.get("FE_BENCH_ROWS", 1_000_000))
BENCH_ENTITIES = int(os.environ.get("FE_BENCH_ENTITIES", 5_000))
CORPUS_DIR = f"/tmp/fe_bench_corpus_v2_r{BENCH_ROWS}_e{BENCH_ENTITIES}"


def ensure_corpus() -> dict:
    import pyarrow.dataset as pds

    from featureengineer_ray.datagen import GenSpec, write_corpus

    marker = os.path.join(CORPUS_DIR, "_DONE")
    if os.path.exists(marker):
        return {"events": os.path.join(CORPUS_DIR, "events"),
                "spine": os.path.join(CORPUS_DIR, "spine.parquet")}
    spec = GenSpec(n_rows=BENCH_ROWS, n_entities=BENCH_ENTITIES,
                   zipf_a=1.1, seed=42, max_len=256,
                   n_spine=BENCH_ROWS // 4)
    paths = write_corpus(CORPUS_DIR, spec, n_files=32,
                         n_procs=min(16, os.cpu_count() or 1))
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    # corpus BEFORE ray.init: generation forks a process pool, which
    # must not inherit a live Ray session
    paths = ensure_corpus()

    # a starved object store (Ray's 30-40% default) forces spilling on
    # payload-heavy shuffles long before RAM is exhausted
    os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.5")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    ctx.enable_tensor_extension_casting = False

    import pyarrow as pa

    from featureengineer_ray import engine, queries as Q
    from featureengineer_ray.pipelines import run_token_stack

    def consume(ds) -> int:
        n = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n

    # warm the OS page cache (untimed): fault the ACTUAL file bytes —
    # count() is satisfied from parquet metadata alone, so the payload
    # column stayed cold and the first timed rep measured one fixed-rate
    # NVMe read (a width-independent ~150 s floor at 96M rows) instead of
    # the engine. On a real cluster the input arrives from distributed
    # storage whose aggregate bandwidth scales with the node count; the
    # warm keeps the single-box measurement about engine scaling.
    def _warm(path: str):
        files = ([os.path.join(path, f) for f in sorted(os.listdir(path))]
                 if os.path.isdir(path) else [path])
        for f in files:
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass

    cold = os.environ.get("FE_BENCH_COLD") == "1"
    if not cold:
        _warm(paths["events"])
        _warm(paths["spine"])
        rd.read_parquet(paths["events"]).count()

    results: dict[str, float] = {}
    extras: dict[str, float] = {}

    if os.environ.get("FE_BENCH_HEADLINE") != "1":
        # same-window canary (VERDICT r4 #5): one pinned query timed
        # FIRST, so every suite number can be normalized by it. The
        # VM's cross-window drift is ~1.5-1.8× on identical code and
        # moves every query together; a real regression moves ONE
        # query's canary ratio. Judged against BASELINE.md's canary
        # column, not absolute seconds.
        from featureengineer_ray import queries as _Qc

        t0 = time.time()
        for _ in _Qc.q_doc_stats(sf_dir).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            pass
        extras["canary"] = {"name": "doc_stats",
                            "sec": round(time.time() - t0, 3)}

    import shutil

    import pyarrow.parquet as _pq

    from featureengineer_ray.partition import plan_partitions

    # plan once (pinned partitioning — resumable runs would reuse it);
    # headline = best of 3 (single-node VM timing noise is ±40%).
    # Read blocks are sized by ROWS (~250k ≈ 150-300 MB of token payload),
    # floored at 2×CPUs: block count tied to CPUs alone hands the sort
    # shuffle multi-GB map blocks at 24M+ rows and the merge stage
    # anti-scales (measured: 8-cpu 24M sort 723s with 16 blocks).
    n_blocks = max(2 * num_cpus, BENCH_ROWS // 250_000)
    # columns= (not select_columns): Ray 2.49 has no projection pushdown,
    # so the planning scan would otherwise decode the full token payload
    plan = plan_partitions(
        rd.read_parquet(paths["events"], columns=["doc_id", "ts"],
                        override_num_blocks=n_blocks),
        "doc_id", "ts", split_hot_keys=True)
    reps = int(os.environ.get("FE_BENCH_REPS", 3))
    times = []
    n_out = 0
    out_dir = f"/tmp/fe_bench_out_{num_cpus}"
    from featureengineer_ray.ioutil import evict_files, prefetch_files

    for _ in range(reps):
        ev = rd.read_parquet(paths["events"], override_num_blocks=n_blocks)
        sp = rd.read_parquet(paths["spine"],
                             override_num_blocks=max(2 * num_cpus,
                                                     n_blocks // 4))
        shutil.rmtree(out_dir, ignore_errors=True)
        if cold:
            # cold protocol: every rep pays the first pass over NEW
            # bytes — evict (untimed), then the job's own distributed
            # prefetch (TIMED) faults them at aggregate bandwidth.
            # Without the prefetch, cold parquet scans page in at queue
            # depth 1 (~200 MB/s, a width-independent floor — see
            # ioutil); with it the cluster reads its shard once,
            # sequentially, in parallel, and every later phase (narrow
            # pre-pass, payload attach) hits the page cache.
            evict_files(paths["events"])
            evict_files(paths["spine"])
        t0 = time.time()
        if cold:
            prefetch_files([paths["events"], paths["spine"]])
        # late materialization (tokens never enter the all-to-all) wins
        # once the payload bytes dominate the exchange: measured 24M rows
        # @8cpu eager 597s vs late 245s. Small corpora keep the eager
        # single-exchange (local bytes cheap, extra phase latency not).
        late_env = os.environ.get("FE_BENCH_LATE")
        late = (BENCH_ROWS >= 8_000_000 if late_env is None
                else late_env == "1")
        ev_files = sorted(
            os.path.join(paths["events"], f)
            for f in os.listdir(paths["events"]) if f.endswith(".parquet"))
        out = run_token_stack(ev, sp, plan=plan, late_materialize=late,
                              payload_paths=ev_files if late else None)
        # parallel parquet sink — draining via driver iter_batches
        # serializes the whole output through one process and caps scaling
        out.write_parquet(out_dir)
        times.append(time.time() - t0)
        if os.environ.get("FE_BENCH_STATS") == "1":
            print(out.stats(), file=sys.stderr)
        n_out = sum(
            _pq.ParquetFile(os.path.join(out_dir, p)).metadata.num_rows
            for p in os.listdir(out_dir) if p.endswith(".parquet"))
    dt = min(times)
    results["flagship_token_stack"] = round(dt, 3)
    extras["headline_times"] = [round(t, 3) for t in times]
    extras["headline_rows"] = n_out
    extras["headline_rows_per_sec"] = round(n_out / dt, 1)

    if os.environ.get("FE_BENCH_HEADLINE") == "1":
        ray.shutdown()
        out = {
            "metric": "feature_rows_per_sec (flagship token stack)",
            "value": results["flagship_token_stack"], "unit": "sec",
            "queries": results, "sf": sf_dir, "num_cpus": num_cpus,
        }
        out.update(extras)
        return out

    t0 = time.time()
    spec = engine.WindowSpec(
        key="user_id", ts="ts", tiebreak="event_id",
        lags={"value": [1, 2]}, rolling={"value": [5]},
        rolling_time={"value": [3_600_000_000]},
        session_gap_us=1_800_000_000, zscore=["value"])
    consume(engine.window_features(
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"]),
        spec))
    results["events_window_stack"] = round(time.time() - t0, 3)

    t0 = time.time()
    Q.q_q1_pricing(sf_dir).to_pandas()
    results["q1_pricing"] = round(time.time() - t0, 3)

    t0 = time.time()
    Q.q_revenue_by_nation(sf_dir).to_pandas()
    results["revenue_by_nation"] = round(time.time() - t0, 3)

    t0 = time.time()
    Q.q_minhash_near_dup(sf_dir)
    results["minhash_near_dup"] = round(time.time() - t0, 3)

    t0 = time.time()
    Q.q_knn_cosine(sf_dir)
    results["knn_cosine"] = round(time.time() - t0, 3)

    t0 = time.time()
    consume(Q.q_doc_stats(sf_dir))
    results["doc_stats"] = round(time.time() - t0, 3)

    ray.shutdown()
    out = {
        "metric": "feature_rows_per_sec (flagship token stack) + suite wall",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    if "canary" in extras:
        c = extras["canary"]["sec"]
        out["queries_canary_ratio"] = {
            k: round(v / c, 2) for k, v in results.items()}
    out.update(extras)
    return out


def run_subprocess(ncpu: int, bench_reps: int | None = None,
                   retries: int = 1, log_tag: str | None = None,
                   cold: bool = False) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), FE_BENCH_HEADLINE="1")
    if cold:
        env["FE_BENCH_COLD"] = "1"
    if bench_reps is not None:
        env["FE_BENCH_REPS"] = str(bench_reps)
    for attempt in range(retries + 1):
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        if log_tag and os.environ.get("FE_SCALE_SAVE_LOGS") == "1":
            # keep each rep's stderr (FE_PHASE_TIMING lines) as evidence
            d = os.environ.get("FE_SCALE_LOG_DIR", "/tmp/fe_scaling_logs")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{log_tag}_a{attempt}.log"), "w") as f:
                f.write(p.stderr)
        if p.returncode == 0:
            return json.loads(p.stdout.strip().splitlines()[-1])
        # surface the child's stderr (a swallowed traceback cost a full
        # measurement window once) and retry ONCE: Ray occasionally dies
        # on startup/shutdown (raylet segfault) independent of the job
        sys.stderr.write(
            f"[bench] subprocess cpus={ncpu} attempt {attempt} exited "
            f"{p.returncode}; stderr tail:\n{p.stderr[-4000:]}\n")
        sys.stderr.flush()
        if attempt < retries:
            time.sleep(60)
    raise RuntimeError(
        f"bench subprocess (cpus={ncpu}) failed after {retries + 1} attempts")


def run_scaling(cold: bool = False) -> dict:
    """Reproducible scaling protocol (VERDICT r2 #2 — one sample is not a
    claim): R fresh-process reps per side, INTERLEAVED lo/hi/lo/hi so
    substrate drift (page cache, thermal, neighbor load) hits both sides
    equally; report per-rep throughputs, the median-based efficiency, the
    per-pair efficiencies, spread, and a 1-min load-average idle check
    before every rep."""
    lo = int(os.environ.get("FE_SCALE_LO", 8))
    hi = int(os.environ.get("FE_SCALE_HI", 32))
    reps = int(os.environ.get("FE_SCALE_REPS", 3))
    inner = int(os.environ.get("FE_BENCH_REPS", 1))
    tputs: dict[int, list[float]] = {lo: [], hi: []}
    secs: dict[int, list[float]] = {lo: [], hi: []}
    loads: list[float] = []
    rows = 0
    # The 1-min load average decays with a 60 s time constant, so after a
    # 32-wide rep (load ~32) a 60 s cooldown still reads ~32/e ≈ 11.8 and
    # the idle check false-positives on our own tail. 240 s drains a
    # 32-wide rep to ~0.6 (32·e⁻⁴); the committed 48M/96M r3 files used
    # cooldown=60 and their machine_idle:false is exactly this artifact
    # (loads 1.9-7.3 right after wide reps, 0.06-0.59 on cold starts).
    cooldown = int(os.environ.get("FE_SCALE_COOLDOWN", 240))
    first = True
    for rep_i in range(reps):
        for side in (lo, hi):
            if not first:
                # drain OUR OWN previous rep out of the 1-min load
                # average — without this the idle check reads the tail
                # of the benchmark itself and always reports busy
                time.sleep(cooldown)
            first = False
            loads.append(round(os.getloadavg()[0], 2))
            r = run_subprocess(side, bench_reps=inner,
                               log_tag=f"rep{rep_i}_cpu{side}",
                               cold=cold)
            tputs[side].append(r["headline_rows_per_sec"])
            secs[side].append(r["queries"]["flagship_token_stack"])
            rows = r["headline_rows"]

    def med(v: list[float]) -> float:
        s = sorted(v)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    eff_median = (med(tputs[hi]) / med(tputs[lo])) / (hi / lo)
    eff_pairs = [round((th / tl) / (hi / lo), 3)
                 for tl, th in zip(tputs[lo], tputs[hi])]
    return {
        "headline_rows": rows,
        "cpus": [lo, hi],
        "reps": reps,
        f"rows_per_sec_{lo}": tputs[lo],
        f"rows_per_sec_{hi}": tputs[hi],
        f"sec_{lo}": secs[lo],
        f"sec_{hi}": secs[hi],
        f"median_rows_per_sec_{lo}": med(tputs[lo]),
        f"median_rows_per_sec_{hi}": med(tputs[hi]),
        f"spread_{lo}": round(max(tputs[lo]) / min(tputs[lo]), 3),
        f"spread_{hi}": round(max(tputs[hi]) / min(tputs[hi]), 3),
        "scaling_efficiency": round(eff_median, 3),
        "scaling_efficiency_per_pair": eff_pairs,
        "loadavg_before_reps": loads,
        "machine_idle": all(ld < 2.0 for ld in loads),
        "protocol": "cold" if cold else "warm",
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        # --cold: evict inputs before every rep; each rep's timed
        # region then includes the job's own distributed prefetch
        # (first-pass-over-new-data model; see ioutil)
        print(json.dumps(run_scaling(cold="--cold" in sys.argv)))
        return
    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
