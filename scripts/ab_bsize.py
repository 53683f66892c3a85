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
    import bench as bench_mod

    CHAIN = 4
    cache = f"/tmp/frames_{cfg.camera.width}x{cfg.camera.height}_{CHAIN+1}_s0.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        frames = [(z[f"g{i}"], z[f"d{i}"]) for i in range(CHAIN + 1)]
    else:
        frames = [
            (f[0], f[1])
            for f in render_sequence(
                SyntheticScene(), cfg.camera, CHAIN + 1, seed=0
            )
        ]
        np.savez(
            cache,
            **{f"g{i}": f[0] for i, f in enumerate(frames)},
            **{f"d{i}": f[1] for i, f in enumerate(frames)},
        )
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
        bench_mod.hard_sync(r.error)
        n = max(4, 64 // B)
        t0 = time.perf_counter()
        for _ in range(n):
            r = vstep(gb, db, kfb, r.R, r.t)
        bench_mod.hard_sync(r.error)  # fetch-sync: block_until_ready can no-op
        ms = (time.perf_counter() - t0) / n * 1e3

        # Honest chained variant (varying frames, identity init; the
        # protocol lives in bench.py once).
        gs = bench_mod.phase_stack(
            [jnp.asarray(frames[1 + i][0].astype(np.uint8)) for i in range(CHAIN)],
            B, CHAIN,
        )
        ds = bench_mod.phase_stack(
            [jnp.asarray((frames[1 + i][1] * cfg.dataset.depth_scale_factor
                          ).astype(np.uint16)) for i in range(CHAIN)],
            B, CHAIN,
        )
        chained = bench_mod.chain_of(jax.vmap(step))
        rc = chained(gs, ds, kfb, Rb, tb)
        bench_mod.hard_sync(rc[1][0])
        nc = max(2, 16 // B)
        t0 = time.perf_counter()
        for _ in range(nc):
            rc = chained(gs, ds, kfb, Rb, tb)
        bench_mod.hard_sync(rc[1][0])
        cms = (time.perf_counter() - t0) / (nc * CHAIN) * 1e3
        print(
            f"B={B:3d}  percall {ms:7.1f} ms/step (agg {B / ms * 1e3:6.1f} fps)"
            f"   chained {cms:7.2f} ms/step (agg {B / cms * 1e3:6.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
