"""Per-dispatch overhead probe: batched step called per-frame from the host
vs lax.scan-chained on device (N steps per dispatch).

The tunnel adds milliseconds of per-execution overhead (device profile of
the B=8 step reads ~9.6 ms vs ~13 ms wall), so chaining steps in one
program recovers real aggregate throughput — and on a normal host it
measures the true dispatch overhead.

    timeout 590 python scripts/ab_chain.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu import tracker
from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence

B = 8
CHAIN = 8


def main():
    base = SystemConfig()
    cfg = dataclasses.replace(
        base,
        pyramid=dataclasses.replace(base.pyramid, compaction="rank"),
        tracker=dataclasses.replace(
            base.tracker,
            optimizer=dataclasses.replace(
                base.tracker.optimizer, solver="gn_fixed"
            ),
        ),
    )
    frames = list(render_sequence(SyntheticScene(), cfg.camera, 2, seed=0))
    g1 = frames[1][0].astype(np.uint8)
    d1 = (frames[1][1] * cfg.dataset.depth_scale_factor).astype(np.uint16)
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
    jax.block_until_ready(kfb.structs)
    gb = jax.device_put(jnp.stack([jnp.asarray(g1)] * B))
    db = jax.device_put(jnp.stack([jnp.asarray(d1)] * B))
    Rb = jax.device_put(jnp.stack([jnp.eye(3)] * B))
    tb = jax.device_put(jnp.stack([jnp.zeros(3)] * B))

    def step(g, d, k, R, t):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    vstep = jax.jit(jax.vmap(step))

    r = vstep(gb, db, kfb, Rb, tb)
    jax.block_until_ready(r)
    n = 16
    t0 = time.perf_counter()
    for _ in range(n):
        r = vstep(gb, db, kfb, r.R, r.t)
    jax.block_until_ready(r)
    per_call = (time.perf_counter() - t0) / n * 1e3
    print(f"per-call batched step: {per_call:6.1f} ms "
          f"(agg {B / per_call * 1e3:6.1f} fps)", flush=True)

    @jax.jit
    def chained(g, d, k, R, t):
        def body(carry, _):
            R_, t_ = carry
            res = jax.vmap(step)(g, d, k, R_, t_)
            return (res.R, res.t), res.error

        (Rf, tf), errs = jax.lax.scan(
            body, (R, t), None, length=CHAIN
        )
        return Rf, tf, errs

    r2 = chained(gb, db, kfb, Rb, tb)
    jax.block_until_ready(r2)
    t0 = time.perf_counter()
    n2 = 4
    for _ in range(n2):
        r2 = chained(gb, db, kfb, r2[0], r2[1])
    jax.block_until_ready(r2)
    per_step = (time.perf_counter() - t0) / (n2 * CHAIN) * 1e3
    print(f"scan-chained x{CHAIN}:      {per_step:6.1f} ms/step "
          f"(agg {B / per_step * 1e3:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
