"""Probe: chained-step speed with VARYING frames per scan step (honest
form — a fixed frame lets XLA hoist the loop-invariant build_frame out of
the scan) vs the fixed-frame chain, at exact-fit and cap50 capacities.

    timeout 580 python scripts/probes/cap_speed2.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu import tracker
from revo_tpu.autotune import calibrate_capacities
from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

B = 8
CHAIN = 8


def bench_scale(base, frames, scale):
    cfg = calibrate_capacities(
        base, [frames[0][0]], [frames[0][1]], margin=scale
    )
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
    jax.block_until_ready(kfb.structs)
    # (CHAIN, B, H, W) varying frames: each scan step gets its own frame.
    gs = jnp.stack(
        [jnp.stack([jnp.asarray(frames[1 + i][0])] * B) for i in range(CHAIN)]
    )
    ds = jnp.stack(
        [jnp.stack([jnp.asarray(frames[1 + i][1])] * B) for i in range(CHAIN)]
    )
    Rb = jax.device_put(jnp.stack([jnp.eye(3)] * B))
    tb = jax.device_put(jnp.stack([jnp.zeros(3)] * B))

    def step(g, d, k, R, t):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    @jax.jit
    def chained_vary(gs, ds, k, R, t):
        def body(carry, gd):
            R_, t_ = carry
            res = jax.vmap(step, in_axes=(0, 0, 0, 0, 0))(
                gd[0], gd[1], k, R_, t_
            )
            return (res.R, res.t), res.error

        (Rf, tf), errs = jax.lax.scan(body, (R, t), (gs, ds))
        return Rf, tf, errs

    @jax.jit
    def chained_fixed(g, d, k, R, t):
        def body(carry, _):
            R_, t_ = carry
            res = jax.vmap(step)(g, d, k, R_, t_)
            return (res.R, res.t), res.error

        (Rf, tf), errs = jax.lax.scan(body, (R, t), None, length=CHAIN)
        return Rf, tf, errs

    for name, fn, args in [
        ("vary ", chained_vary, (gs, ds, kfb, Rb, tb)),
        ("fixed", chained_fixed, (gs[0], ds[0], kfb, Rb, tb)),
    ]:
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = fn(args[0], args[1], args[2], r[0], r[1])
        jax.block_until_ready(r)
        per = (time.perf_counter() - t0) / (n * CHAIN) * 1e3
        print(
            f"scale={scale:.2f} {name} caps={cfg.pyramid.edge_capacity} "
            f"B8 {per:6.2f} ms/step (agg {B/per*1e3:6.1f} fps) "
            f"err={np.asarray(r[2])[-1,0]:.4f}",
            flush=True,
        )


def main():
    base = SystemConfig()
    frames = list(
        render_sequence(SyntheticScene(), base.camera, CHAIN + 1, seed=0)
    )
    for s in [1.10, 0.50]:
        bench_scale(base, frames, s)


if __name__ == "__main__":
    main()
