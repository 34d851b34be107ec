"""Endurance/scale proof: a sustained batched run of >=200 DAVIS-style pairs.

The reference's production claim is scale (DMO: 59 GB of generated data,
README.md:6-31) — the failure modes at that scale are compile-set blowup,
host-memory creep, and throughput sag, none of which a 12-pair bench can see.
This run measures all three on one process:

  - steady-state pairs/s (whole run + second half, where every program is warm)
  - p50/p95 per-pair latency from the batched loop's iteration telemetry
    (para_gen.CHUNK_STATS)
  - RSS sampled every 2 s; asserts the last quarter does not keep growing
  - a census of XLA compiles (jax_log_compiles); asserts the compile set is
    BOUNDED: the object-size schedule cycles twice, and the second cycle must
    compile NOTHING new

Object sizes step through 12 (solve-bucket-spanning) shapes, 8 frames per
block, so segments sweep a wide slice of the 31-bucket ladder including the
transposed (wide-flat) path; motion inside a block is rigid translation, so
flow accuracy is spot-checked on in-block pairs like pipeline_bench.

    python scripts/endurance.py [n_pairs] [out.json]
"""

import json
import logging
import os
import os.path as osp
import shutil
import sys
import threading
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from PIL import Image

H, W = 480, 854
BLOCK = 8  # frames per size block; pairs inside a block are rigid
# (ry, rx) ellipse semi-axes for object 1: spans small -> large, wide-flat
# (transposed solve) and tall-narrow shapes; object 2 uses the schedule
# shifted by half a cycle so each pair carries two different buckets
SIZES = [
    (24, 40), (40, 64), (56, 90), (72, 120), (90, 140), (110, 170),
    (130, 200), (150, 230), (28, 130), (120, 45), (160, 60), (64, 64),
]


def _sizes(t):
    b = t // BLOCK
    s1 = SIZES[b % len(SIZES)]
    s2 = SIZES[(b + len(SIZES) // 2) % len(SIZES)]
    # object 2 at 2/3 scale keeps the two objects from overlapping
    return s1, (max(12, 2 * s2[0] // 3), max(20, 2 * s2[1] // 3))


def _bounce(t, step, lo, hi):
    span = hi - lo
    ph = (step * t) % (2 * span)
    return lo + (ph if ph <= span else 2 * span - ph)


def _centers(t):
    (ry1, rx1), (ry2, rx2) = _sizes(t)
    # bounce inside margins wide enough for the LARGEST size in the schedule
    # so centers never depend on the current size (rigid inside blocks)
    c1 = (_bounce(t, 5, 170, 310), _bounce(t, 8, 250, 430))
    c2 = (_bounce(t + 37, 4, 120, 330), _bounce(t + 91, 7, 520, 740))
    return c1, c2


def make_dataset(root, n_frames, seed=0):
    rng = np.random.default_rng(seed)
    base = np.kron(
        rng.uniform(40, 255, (H // 8 + 2, W // 8 + 2, 3)), np.ones((8, 8, 1))
    )[:H, :W]
    detail = np.kron(
        rng.uniform(-30, 30, (H // 2 + 1, W // 2 + 1, 3)), np.ones((2, 2, 1))
    )[:H, :W]
    tex = np.clip(base + detail, 0, 255).astype(np.uint8)
    bg = (np.clip(base[::-1] * 0.4, 0, 255)).astype(np.uint8)
    os.makedirs(osp.join(root, "orgRGB", "seq0"), exist_ok=True)
    os.makedirs(osp.join(root, "orgMasks", "seq0"), exist_ok=True)
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(n_frames):
        img = bg.copy()
        mask = np.zeros((H, W), np.uint8)
        (c1, c2) = _centers(t)
        (s1, s2) = _sizes(t)
        for seg, ((cy, cx), (ry, rx)) in enumerate(((c1, s1), (c2, s2)), 1):
            ob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
            img[ob] = tex[(yy[ob] - cy) % H, (xx[ob] - cx) % W]
            mask[ob] = seg
        Image.fromarray(img).save(
            osp.join(root, "orgRGB", "seq0", f"{t:05d}.jpg"), quality=95
        )
        Image.fromarray(mask).save(
            osp.join(root, "orgMasks", "seq0", f"{t:05d}.png")
        )


class RssSampler(threading.Thread):
    def __init__(self, period=2.0):
        super().__init__(daemon=True)
        self.period = period
        self.samples = []  # (t, rss_mb)
        self._stop = threading.Event()

    @staticmethod
    def _rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    def run(self):
        while not self._stop.is_set():
            self.samples.append((time.time(), self._rss_mb()))
            self._stop.wait(self.period)

    def stop(self):
        self._stop.set()


class CompileCensus(logging.Handler):
    """Counts XLA compiles via jax_log_compiles' 'Finished tracing +
    compiling' records (logged at WARNING when the flag is on)."""

    def __init__(self):
        super().__init__()
        self.events = []  # (t, message)

    def emit(self, record):
        msg = record.getMessage()
        if "Finished tracing + compiling" in msg or "Compiling" in msg:
            self.events.append((time.time(), msg.split("\n")[0][:160]))


def check_accuracy(out_dir, data_dir, t):
    """Median flow of each object on pair (t, t+1) must match its rigid
    translation (valid only for pairs strictly inside a size block)."""
    from arap_flow_tpu.io import flo as flo_io

    flo_path = osp.join(out_dir, "Flow", "seq0", f"{t:05d}.flo")
    msk_path = osp.join(data_dir, "orgMasks", "seq0", f"{t:05d}.png")
    u, v = flo_io.flow_read(flo_path)
    mask = np.array(Image.open(msk_path))
    c0, c1 = _centers(t), _centers(t + 1)
    bad = []
    for seg in (1, 2):
        sel = mask == seg
        if sel.sum() < 400:
            continue
        du = float(c1[seg - 1][1] - c0[seg - 1][1])
        dv = float(c1[seg - 1][0] - c0[seg - 1][0])
        mu, mv = float(np.median(u[sel])), float(np.median(v[sel]))
        if abs(mu - du) >= 1.0 or abs(mv - dv) >= 1.0:
            bad.append((t, seg, (mu, mv), (du, dv)))
    return bad


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    import jax

    jax.config.update("jax_log_compiles", True)
    census = CompileCensus()
    logging.getLogger("jax").addHandler(census)

    from arap_flow_tpu.pipeline import para_gen
    from arap_flow_tpu.pipeline.para_gen import PipelineFlags, main_pipeline

    root = "/tmp/arap_endurance"
    shutil.rmtree(root, ignore_errors=True)
    data = osp.join(root, "data")
    print(f"building {n_pairs + 1}-frame dataset ...", flush=True)
    make_dataset(data, n_pairs + 1)

    rss = RssSampler()
    rss.start()
    out = osp.join(root, "out")
    t0 = time.time()
    triples = main_pipeline(
        PipelineFlags(input=data, output=out, fd=1, multseg=True, seed=0,
                      mode="batched")
    )
    wall = time.time() - t0
    rss.stop()
    rss.join(5)

    assert len(triples) == n_pairs, (len(triples), n_pairs)

    # ---- throughput + latency ----
    stats = list(para_gen.CHUNK_STATS)
    per_pair = sorted(
        w / p for p, w in stats for _ in range(p) if p
    )
    half = stats[len(stats) // 2 :]
    ss_pairs = sum(p for p, _ in half)
    ss_wall = sum(w for _, w in half)
    p50 = per_pair[len(per_pair) // 2]
    p95 = per_pair[min(len(per_pair) - 1, int(0.95 * len(per_pair)))]

    # ---- compile census: the schedule cycles after BLOCK*len(SIZES) frames;
    # everything after the first full cycle + one chunk must hit the cache ----
    cutoff_frac = 0.60
    t_cut = t0 + cutoff_frac * wall
    late = [(t - t0, m) for t, m in census.events if t > t_cut]
    n_early = sum(1 for t, _ in census.events if t0 <= t <= t_cut)

    # ---- RSS: last quarter must not keep growing ----
    rs = [(t - t0, m) for t, m in rss.samples if t >= t0]
    q = max(1, len(rs) // 4)
    max_q3 = max(m for _, m in rs[: 3 * q])
    max_q4 = max(m for _, m in rs[3 * q :])
    rss_ok = max_q4 <= 1.05 * max_q3

    # ---- accuracy spot checks: 2nd pair of every 3rd size block ----
    bad = []
    for t in range(1, n_pairs - 1, 3 * BLOCK):
        if (t + 1) // BLOCK == t // BLOCK:  # pair inside one block
            bad += check_accuracy(out, data, t)

    result = {
        "n_pairs": n_pairs,
        "wall_s": round(wall, 1),
        "pairs_per_s": round(n_pairs / wall, 3),
        "steady_state_pairs_per_s": round(ss_pairs / ss_wall, 3),
        "latency_p50_s_per_pair": round(p50, 3),
        "latency_p95_s_per_pair": round(p95, 3),
        "compiles_total": len(census.events),
        "compiles_after_60pct": len(late),
        "compiles_before_60pct": n_early,
        "rss_start_mb": round(rs[0][1], 1) if rs else None,
        "rss_peak_mb": round(max(m for _, m in rs), 1) if rs else None,
        "rss_last_quarter_max_mb": round(max_q4, 1),
        "rss_bounded": bool(rss_ok),
        "accuracy_failures": bad,
        "chunk_count": len(stats),
    }
    print(json.dumps(result), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    if late:
        print("LATE COMPILES:", *[m for _, m in late[:20]], sep="\n  ")
    assert not bad, f"flow accuracy failures: {bad}"
    assert not late, f"compile set unbounded: {len(late)} compiles after 60%"
    assert rss_ok, f"RSS still growing: q3 max {max_q3:.0f} -> q4 max {max_q4:.0f} MB"
    print("endurance ok", flush=True)


if __name__ == "__main__":
    main()
