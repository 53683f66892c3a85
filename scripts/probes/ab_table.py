"""In-context A/B: compaction table impl (one-hot reduce vs lane sort)
inside the honest varying-frame chained batched step.

    TABLE=rank_sort CAP=0.5 timeout 580 python scripts/probes/ab_table.py

The chaining protocol (phase-shifted varying frames, identity init per
dispatch, divergence-checked) is shared with bench.py — fix it there once.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import chain_of, phase_stack
from revo_tpu import tracker
from revo_tpu.autotune import calibrate_capacities
from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

B, CHAIN = 8, 4
TABLE = os.environ.get("TABLE", "rank")
CAP = float(os.environ.get("CAP", "0.5"))


def main():
    base = SystemConfig()
    base = dataclasses.replace(
        base, pyramid=dataclasses.replace(base.pyramid, compaction=TABLE)
    )
    cache = f"/tmp/frames_{base.camera.width}x{base.camera.height}_{CHAIN+1}_s0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z[f"g{i}"], z[f"d{i}"]) for i in range(CHAIN + 1)]
    else:
        frames = [
            (f[0], f[1])
            for f in render_sequence(
                SyntheticScene(), base.camera, CHAIN + 1, seed=0
            )
        ]
        np.savez(
            cache,
            **{f"g{i}": f[0] for i, f in enumerate(frames)},
            **{f"d{i}": f[1] for i, f in enumerate(frames)},
        )
    cfg = calibrate_capacities(
        base, [frames[0][0]], [frames[0][1]], margin=CAP
    )
    f0 = build_frame(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg
    )
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
    jax.block_until_ready(kfb.structs)
    gs = phase_stack(
        [jnp.asarray(frames[1 + i][0]) for i in range(CHAIN)], B, CHAIN
    )
    ds = phase_stack(
        [jnp.asarray(frames[1 + i][1]) for i in range(CHAIN)], B, CHAIN
    )
    Rb = jnp.stack([jnp.eye(3)] * B)
    tb = jnp.stack([jnp.zeros(3)] * B)

    def step(g, d, k, R, t):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    from bench import hard_sync

    chained = chain_of(jax.vmap(step))
    r = chained(gs, ds, kfb, Rb, tb)
    hard_sync(r[1][0])
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        r = chained(gs, ds, kfb, Rb, tb)
    hard_sync(r[1][0])  # fetch-sync: block_until_ready can no-op
    per = (time.perf_counter() - t0) / (n * CHAIN) * 1e3
    print(
        f"table={TABLE} cap={CAP} caps={cfg.pyramid.edge_capacity} "
        f"B8 vary-chain {per:6.2f} ms/step (agg {B/per*1e3:6.1f} fps) "
        f"err={np.asarray(r[1][0])[-1,0]:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
