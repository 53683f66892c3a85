"""Probe: chained-step speed vs capacity decimation scale (TPU).

Pairs with cap_ate.py — solver gather cost is per-index, so capacity
below the fitted edge count buys time linearly; this measures how much.

    timeout 580 python scripts/probes/cap_speed.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import dataclasses
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
    g1 = frames[1][0]
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
    jax.block_until_ready(kfb.structs)
    gb = jax.device_put(jnp.stack([jnp.asarray(g1)] * B))
    db = jax.device_put(jnp.stack([jnp.asarray(frames[1][1])] * B))
    Rb = jax.device_put(jnp.stack([jnp.eye(3)] * B))
    tb = jax.device_put(jnp.stack([jnp.zeros(3)] * B))

    def step(g, d, k, R, t):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    @jax.jit
    def chained(g, d, k, R, t):
        def body(carry, _):
            R_, t_ = carry
            res = jax.vmap(step)(g, d, k, R_, t_)
            return (res.R, res.t), res.error

        (Rf, tf), errs = jax.lax.scan(body, (R, t), None, length=CHAIN)
        return Rf, tf, errs

    @jax.jit
    def chained1(g, d, k, R, t):
        def body(carry, _):
            R_, t_ = carry
            res = step(g, d, k, R_, t_)
            return (res.R, res.t), res.error

        (Rf, tf), errs = jax.lax.scan(body, (R, t), None, length=CHAIN)
        return Rf, tf, errs

    r2 = chained(gb, db, kfb, Rb, tb)
    jax.block_until_ready(r2)
    t0 = time.perf_counter()
    n2 = 6
    for _ in range(n2):
        r2 = chained(gb, db, kfb, r2[0], r2[1])
    jax.block_until_ready(r2)
    per_b = (time.perf_counter() - t0) / (n2 * CHAIN) * 1e3

    g1d = jax.device_put(jnp.asarray(g1))
    d1d = jax.device_put(jnp.asarray(frames[1][1]))
    r1 = chained1(g1d, d1d, kf, jnp.eye(3), jnp.zeros(3))
    jax.block_until_ready(r1)
    t0 = time.perf_counter()
    n1 = 10
    for _ in range(n1):
        r1 = chained1(g1d, d1d, kf, r1[0], r1[1])
    jax.block_until_ready(r1)
    per_1 = (time.perf_counter() - t0) / (n1 * CHAIN) * 1e3
    print(
        f"scale={scale:.2f} caps={cfg.pyramid.edge_capacity} "
        f"B8 {per_b:6.2f} ms/step (agg {B/per_b*1e3:6.1f} fps)  "
        f"single {per_1:5.2f} ms ({1e3/per_1:5.1f} fps)  "
        f"err={np.asarray(r2[2])[-1,0]:.4f}",
        flush=True,
    )


def main():
    base = SystemConfig()
    frames = list(render_sequence(SyntheticScene(), base.camera, 2, seed=0))
    for s in [1.10, 0.75, 0.50, 0.35, 0.25]:
        bench_scale(base, frames, s)


if __name__ == "__main__":
    main()
