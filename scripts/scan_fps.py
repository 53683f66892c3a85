"""Full system-scan throughput at 640x480 on TPU: the complete replay mode
(parallel.batch.vo_scan — tracking + histogram voting + promotion re-track
+ jump gate) over a device-resident sequence, one dispatch total.

    timeout 590 python scripts/scan_fps.py [n_frames]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu.config import SystemConfig
from revo_tpu.io.synthetic import SyntheticScene, render_sequence
from revo_tpu.parallel.batch import vo_scan


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = SystemConfig()
    frames = list(render_sequence(SyntheticScene(), cfg.camera, n, seed=0))
    margin = float(os.environ.get("SCAN_MARGIN", "0"))
    if margin > 0:
        from revo_tpu.autotune import calibrate_capacities

        cfg = calibrate_capacities(
            cfg, [frames[0][0]], [frames[0][1]], margin=margin
        )
        print(f"margin={margin} caps={cfg.pyramid.edge_capacity}")
    grays = jnp.asarray(np.stack([f[0] for f in frames]))
    depths = jnp.asarray(np.stack([f[1] for f in frames]))
    jax.block_until_ready((grays, depths))

    poses, outs, state = vo_scan(grays, depths, cfg)
    float(np.asarray(outs.error)[-1])  # fetch-sync (hard_sync semantics)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        poses, outs, state = vo_scan(grays, depths, cfg)
    float(np.asarray(outs.error)[-1])  # fetch-sync: block_until_ready can
    # no-op on the axon tunnel (CLAUDE.md) — a data fetch is the only
    # reliable sync.
    dt = (time.perf_counter() - t0) / reps
    print(
        f"vo_scan {n} frames 640x480 (full system: vote + promote + jump "
        f"gate): {dt * 1e3:.1f} ms -> {n / dt:.1f} fps; "
        f"promotions={int(np.asarray(outs.promoted).sum())}"
    )


if __name__ == "__main__":
    main()
