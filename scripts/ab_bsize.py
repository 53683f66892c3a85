"""Batch-size scaling probe: ms/batched-step and aggregate fps at B=4..32.

Per-step fixed overheads (dispatch, small ops, canny grid latency)
amortize with B while the gather/compaction work scales linearly — run on
the TPU to pick the bench/deployment batch size.

    timeout 590 python scripts/ab_bsize.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from revo_tpu import tracker
    from revo_tpu.config import SystemConfig
    from revo_tpu.frontend import build_frame, make_keyframe
    from revo_tpu.io.synthetic import SyntheticScene, render_sequence

    base = SystemConfig()
    cfg = dataclasses.replace(
        base,
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
    jax.block_until_ready(kf.structs)

    def step(gg, dd, k, R, t):
        f = build_frame(gg, dd, cfg)
        return tracker.track_frames(k, f, R, t, cfg)

    for B in (4, 8, 16, 32):
        vstep = jax.jit(jax.vmap(step))
        gb = jax.device_put(jnp.stack([jnp.asarray(g1)] * B))
        db = jax.device_put(jnp.stack([jnp.asarray(d1)] * B))
        kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
        Rb = jnp.stack([jnp.eye(3)] * B)
        tb = jnp.stack([jnp.zeros(3)] * B)
        r = vstep(gb, db, kfb, Rb, tb)
        jax.block_until_ready(r)
        n = max(4, 64 // B)
        t0 = time.perf_counter()
        for _ in range(n):
            r = vstep(gb, db, kfb, r.R, r.t)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(
            f"B={B:3d}  {ms:7.1f} ms/batched-step  (agg {B / ms * 1e3:6.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
