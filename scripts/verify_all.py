"""One-shot TPU verification: golden EPE, backend parity, LM, bench.

Run on the TPU host (takes ~5-15 min cold, ~3 min with a warm compile cache):

    python scripts/verify_all.py
"""

import subprocess
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run(name, args):
    print(f"\n===== {name} =====", flush=True)
    r = subprocess.run([sys.executable, *args], cwd=ROOT)
    print(f"===== {name}: exit {r.returncode} =====", flush=True)
    return r.returncode


def main():
    rc = 0
    rc |= run("golden cat512 (parity schedule)",
              ["scripts/golden_cat512.py", "parity"])
    rc |= run("backend comparison", ["scripts/pallas_check.py"])
    rc |= run("LM regression bound", ["scripts/lm_check.py"])
    rc |= run("headline bench", ["bench.py"])
    print("\nALL OK" if rc == 0 else "\nFAILURES — see above")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
