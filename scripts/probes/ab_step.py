"""Measure the current tree's honest vary-chained step — B=8 batched
(gn_fixed, the bench batch path) and single-sequence (default solver) —
for before/after A/Bs of a working-tree change:

    timeout 580 python scripts/probes/ab_step.py          # after
    git stash && timeout 580 python scripts/probes/ab_step.py && git stash pop

Chaining protocol (phase-shifted varying frames, identity init, divergence
check via bench helpers) shared with bench.py.  CAP env sets the autotune
margin (default 1.10 = bench exact-fit).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import chain_of, phase_stack, hard_sync, _batched_cfg
from revo_tpu import tracker
from revo_tpu.autotune import calibrate_capacities
from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

B, CHAIN = 8, 4
CAP = float(os.environ.get("CAP", "1.10"))


def load_frames(base):
    cache = (
        f"/tmp/frames_{base.camera.width}x{base.camera.height}_{CHAIN+1}"
        "_s0.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        return [(z[f"g{i}"], z[f"d{i}"]) for i in range(CHAIN + 1)]
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
    return frames


def main():
    base = SystemConfig()
    frames = load_frames(base)
    cfg = calibrate_capacities(
        base, [frames[0][0]], [frames[0][1]], margin=CAP
    )
    f0 = build_frame(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg
    )
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    jax.block_until_ready(kf.structs)
    gs1 = jnp.stack([jnp.asarray(frames[1 + i][0]) for i in range(CHAIN)])
    ds1 = jnp.stack([jnp.asarray(frames[1 + i][1]) for i in range(CHAIN)])

    # Single-sequence chain, default solver.
    def step1(g, d, k, R, t):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    ch1 = chain_of(step1)
    r = ch1(gs1, ds1, kf, jnp.eye(3), jnp.zeros(3))
    hard_sync(r[1][0])
    t0 = time.perf_counter()
    n = 16
    for _ in range(n):
        r = ch1(gs1, ds1, kf, jnp.eye(3), jnp.zeros(3))
    hard_sync(r[1][0])
    per1 = (time.perf_counter() - t0) / (n * CHAIN) * 1e3

    # Batched B=8 chain, gn_fixed.
    cfg_b = _batched_cfg(cfg)

    def stepb(g, d, k, R, t):
        f = build_frame(g, d, cfg_b)
        return tracker.track_frames(k, f, R, t, cfg_b)

    kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
    gs = phase_stack([jnp.asarray(frames[1 + i][0]) for i in range(CHAIN)], B, CHAIN)
    ds = phase_stack([jnp.asarray(frames[1 + i][1]) for i in range(CHAIN)], B, CHAIN)
    Rb = jnp.stack([jnp.eye(3)] * B)
    tb = jnp.stack([jnp.zeros(3)] * B)
    chb = chain_of(jax.vmap(stepb))
    rb = chb(gs, ds, kfb, Rb, tb)
    hard_sync(rb[1][0])
    t0 = time.perf_counter()
    nb = 8
    for _ in range(nb):
        rb = chb(gs, ds, kfb, Rb, tb)
    hard_sync(rb[1][0])
    perb = (time.perf_counter() - t0) / (nb * CHAIN) * 1e3

    print(
        f"cap={CAP} caps={cfg.pyramid.edge_capacity}\n"
        f"single vary-chain {per1:6.2f} ms/step ({1e3/per1:6.1f} fps) "
        f"err={np.asarray(r[1][0])[-1]:.4f}\n"
        f"batch8 vary-chain {perb:6.2f} ms/step (agg {B/perb*1e3:6.1f} fps) "
        f"err={np.asarray(rb[1][0])[-1,0]:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
