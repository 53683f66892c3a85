"""A/B: gn_fixed per-level iteration counts vs accuracy and speed.

The solver runs coarse-to-fine; by the finest level the pose is nearly
converged, so the fine level may need fewer fixed GN iterations than
the coarse ones.  Runs the bench chain protocol for several
``fixed_iters`` schedules in subprocesses; prints ms/step + chain ATE.
Usage: python scripts/probes/ab_iters.py
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
import jax
import numpy as np, jax.numpy as jnp
import bench
from revo_tpu import tracker
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.config import SystemConfig
from revo_tpu.autotune import calibrate_capacities
import functools

import dataclasses
cfg = SystemConfig()
_iters = tuple(int(x) for x in os.environ["AB_ITERS"].split(","))
cfg = dataclasses.replace(
    cfg,
    tracker=dataclasses.replace(
        cfg.tracker,
        optimizer=dataclasses.replace(
            cfg.tracker.optimizer, solver="gn_fixed",
            fixed_iters=_iters + (12,) * (6 - len(_iters)),
        ),
    ),
)
grays, depths, gt = bench._build_inputs(cfg)
cfg = calibrate_capacities(cfg, grays[:2], depths[:2], margin=1.10)

@functools.partial(jax.jit, static_argnames=("c",))
def vo_step(g, d, kf, R0, t0, c):
    f = build_frame(g, d, c)
    return tracker.track_frames(kf, f, R0, t0, c)

g_u8 = [g.astype(np.uint8) for g in grays]
d_u16 = [(d * cfg.dataset.depth_scale_factor).astype(np.uint16) for d in depths]
f0 = build_frame(jax.device_put(g_u8[0]), jax.device_put(d_u16[0]), cfg)
kf = make_keyframe(f0, jnp.eye(4), cfg)
jax.block_until_ready(kf.structs)
g_dev = [jax.device_put(x) for x in g_u8]
d_dev = [jax.device_put(x) for x in d_u16]
xs_g, xs_d = jnp.stack(g_dev), jnp.stack(d_dev)
single = bench.chain_of(lambda g, d, k, R, t: vo_step(g, d, k, R, t, cfg))
fps, r = bench._time_chain(
    single, (xs_g, xs_d, kf, jnp.eye(3), jnp.zeros(3)), 3, bench.N_FRAMES,
    "ab_precision",
)
ate = bench._ate_m(r, gt)
print(json.dumps({
    "mode": os.environ["AB_ITERS"],
    "single_scan_fps": round(fps, 1),
    "ms_per_step": round(1000.0 / fps, 3),
    "ate_mm": round(ate * 1000.0, 3),
    "platform": jax.default_backend(),
}))
"""


def main():
    code = CHILD % {"root": HERE}
    default_modes = "12,12,12 8,10,12 6,10,12 8,12,12 6,8,12"
    modes = (os.environ.get("AB_ITERS_MODES") or default_modes).split()
    if not modes:
        modes = default_modes.split()
    for mode in modes:
        parsed = [x for x in mode.split(",") if x.strip()]
        if not 0 < len(parsed) <= 6 or not all(x.strip().isdigit() for x in parsed):
            print(f"{mode}: SKIPPED (need 1-6 comma-separated ints)")
            continue
        env = dict(os.environ, AB_ITERS=mode)
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=880, cwd=HERE,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else f"{mode}: FAILED\n{r.stderr[-500:]}")


if __name__ == "__main__":
    main()
