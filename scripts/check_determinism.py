"""Cross-parallelism determinism check (FIXTURES.md §5): run the flagship
in TWO fresh processes at num_cpus=2 and 8 on the same input; sorted
outputs must be byte-identical.

Usage: python scripts/check_determinism.py
"""

from __future__ import annotations

import os
import subprocess
import sys

CHILD = """
import os, sys, hashlib
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]), include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
ctx = DataContext.get_current()
ctx.enable_progress_bars = False
ctx.enable_tensor_extension_casting = False
import ray.data as rd
from featureengineer_ray.pipelines import run_token_stack
ev = rd.read_parquet(sys.argv[2])
sp = rd.read_parquet(sys.argv[3])
out = run_token_stack(ev, sp).to_pandas()
out = out.sort_values("spine_id").reset_index(drop=True)
h = hashlib.sha256()
for c in sorted(out.columns):
    col = out[c]
    if col.dtype == object:
        vals = col.map(lambda v: str(list(v)) if v is not None and not
                       isinstance(v, (str, float)) else str(v))
    else:
        vals = col.map(lambda v: f"{{v!r}}")
    h.update(("\\x1f".join(vals) + "\\x1e").encode())
print(h.hexdigest())
ray.shutdown()
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from featureengineer_ray.datagen import GenSpec, write_corpus

    d = "/tmp/fe_determinism_corpus"
    if not os.path.exists(os.path.join(d, "events")):
        write_corpus(d, GenSpec(n_rows=20_000, n_entities=120, zipf_a=1.3,
                                seed=13), n_files=8)
    script = CHILD.format(repo=repo)
    digests = {}
    for n in (2, 8):
        p = subprocess.run(
            [sys.executable, "-c", script, str(n),
             os.path.join(d, "events"), os.path.join(d, "spine")],
            capture_output=True, text=True, check=True)
        digests[n] = p.stdout.strip().splitlines()[-1]
        print(f"num_cpus={n}: {digests[n]}")
    if digests[2] == digests[8]:
        print("DETERMINISTIC: byte-identical sorted output at 2 vs 8 CPUs")
        sys.exit(0)
    print("MISMATCH")
    sys.exit(1)


if __name__ == "__main__":
    main()
