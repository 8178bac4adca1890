"""Parse FE_PHASE_TIMING flagship logs into a per-phase table.

A phase log (``RAY_GRAFT_CPUS=N FE_BENCH_HEADLINE=1 FE_PHASE_TIMING=1
python bench.py > log``) contains, per rep, cumulative ``[late-phase]``
markers and ends with one JSON line carrying ``headline_times`` (rep
wall times, in execution order). This tool converts the cumulative
markers into per-phase DELTAS, takes the per-phase median across reps,
and — given two logs — reports the width-scaling ratio per phase
(lo_median / hi_median), the decomposition BASELINE.md §3 cites.

Usage:
    python scripts/phase_report.py LOG            # one width
    python scripts/phase_report.py LO_LOG HI_LOG  # + width scaling
"""

from __future__ import annotations

import json
import re
import statistics
import sys

MARK = re.compile(r"\[late-phase\] (.+?): \+([\d.]+)s")

# canonical phase names: collapse the variable-text markers
CANON = [
    ("plan", "plan"),
    ("narrow asof built", "asof build (incl split-state pre-pass)"),
    ("narrow asof materialized", "asof all-to-all + window kernels"),
    ("bloom locator built", "bloom locator (OR-reduce)"),
    ("attach probe", "attach probe / pre-pass"),
    ("attach pre-pass", "attach probe / pre-pass"),
    ("attach pipeline built", "attach pipeline build"),
]
TAIL = "payload attach + sink"


def canon(label: str) -> str:
    for prefix, name in CANON:
        if label.startswith(prefix):
            return name
    return label


def parse_log(path: str) -> list[dict[str, float]]:
    """→ one {phase: delta_seconds} dict per rep (incl. the sink tail)."""
    reps: list[list[tuple[str, float]]] = []
    headline_times: list[float] | None = None
    with open(path) as f:
        for line in f:
            m = MARK.search(line)
            if m:
                name, t = canon(m.group(1)), float(m.group(2))
                if name == "plan":
                    reps.append([])
                if reps:
                    reps[-1].append((name, t))
                continue
            if line.startswith("{") and "headline_times" in line:
                headline_times = json.loads(line)["headline_times"]
    out = []
    for i, marks in enumerate(reps):
        deltas: dict[str, float] = {}
        prev = 0.0
        for name, t in marks:
            deltas[name] = deltas.get(name, 0.0) + (t - prev)
            prev = t
        if headline_times is not None and i < len(headline_times):
            deltas[TAIL] = headline_times[i] - prev
            deltas["TOTAL"] = headline_times[i]
        out.append(deltas)
    return out


def medians(reps: list[dict[str, float]]) -> dict[str, float]:
    keys: list[str] = []
    for r in reps:
        for k in r:
            if k not in keys:
                keys.append(k)
    return {k: statistics.median([r[k] for r in reps if k in r])
            for k in keys}


def main() -> None:
    paths = sys.argv[1:]
    if not 1 <= len(paths) <= 2:
        sys.exit(__doc__)
    sides = [medians(parse_log(p)) for p in paths]
    for p, reps in zip(paths, (parse_log(q) for q in paths)):
        print(f"# {p}: {len(reps)} rep(s)")
    phases = [k for k in sides[0] if k != "plan"]
    if len(sides) == 1:
        print(f"{'phase':45s} {'median s':>9s}")
        for k in phases:
            print(f"{k:45s} {sides[0][k]:9.1f}")
    else:
        print(f"{'phase':45s} {'lo s':>8s} {'hi s':>8s} {'scaling':>8s}")
        for k in phases:
            lo, hi = sides[0].get(k), sides[1].get(k)
            if lo is None or hi is None:
                continue
            ratio = lo / hi if hi > 0.05 else float("nan")
            print(f"{k:45s} {lo:8.1f} {hi:8.1f} {ratio:7.2f}x")


if __name__ == "__main__":
    main()
