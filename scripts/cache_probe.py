"""Compile-cache fingerprint investigation (CLAUDE.md: identical programs
re-fingerprint across processes; 40-300 s per cold compile).

Runs the SAME small solver program in N fresh subprocesses and records the
persistent-cache key each process computes (via jax's cache-key logger), the
compile time, and whether the persistent cache hit. Prints a diagnosis.

    python scripts/cache_probe.py [n_procs]
"""

import os
import pathlib
import re
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])

CHILD = r"""
import logging, time, sys
logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)
sys.path.insert(0, %(repo)r)
import numpy as np
import arap_flow_tpu  # enables the persistent cache
import jax
from arap_flow_tpu.ops import energy as E
from arap_flow_tpu.ops import solver as S
from arap_flow_tpu.io.constraints import add_border_pins

H, W = 128, 256
mask = np.full((H, W), 255, np.uint8)
mask[8:-8, 8:-8] = 0
cons = add_border_pins(np.array([[64, 64, 66, 65]], np.int32), W, H)
ops = E.build_operands(mask, cons)
cfg = S.SolverConfig(num_anneal=2, gn_iters=2, max_pcg_iters=40, pcg_iters=40.0)
t0 = time.time()
x, f = S.solve(ops, cfg)
np.asarray(f)
print("COMPILE_WALL %%.1f" %% (time.time() - t0), flush=True)
"""


def run_child(i):
    env = dict(os.environ)
    env["JAX_DEBUG_LOG_MODULES"] = "jax._src.compilation_cache"
    code = CHILD % {"repo": REPO}
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=1200)
    keys = re.findall(r"cache key ([0-9a-f]{16,})", r.stdout)
    hits = len(re.findall(r"(Persistent compilation cache hit|cache hit for key)",
                          r.stdout))
    writes = len(re.findall(r"(Writing .* to persistent compilation cache|cache miss)",
                            r.stdout, re.IGNORECASE))
    wall = re.findall(r"COMPILE_WALL ([0-9.]+)", r.stdout)
    print(f"proc {i}: wall={wall[-1] if wall else '?'}s "
          f"keys={sorted(set(keys))[:4]} hits={hits} miss/writes={writes}")
    if not keys and i == 0:
        # dump interesting lines for manual inspection on the first proc
        for line in r.stdout.splitlines():
            if "cache" in line.lower() and "jax" in line.lower():
                print("   |", line[:200])
    return set(keys), hits, r.stdout


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    all_keys = []
    for i in range(n):
        keys, hits, _ = run_child(i)
        all_keys.append(keys)
    agree = all(k == all_keys[0] for k in all_keys[1:]) and all_keys[0]
    print(f"\ncache keys {'AGREE' if agree else 'DIFFER (or not captured)'} "
          f"across {n} fresh processes")


if __name__ == "__main__":
    main()
