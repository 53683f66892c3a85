"""In-context A/B of the BATCHED (vmapped) step: quad-table forms + take4.

The batched gather emitter re-copies the (B, H, W, 12) quad table to its
preferred layout inside the solver while-loop (hlo: copy.803 x12/step), so
the stored table form is a measured knob — run this on the TPU to pick
OptimizerConfig.quad_form for the batch path.

    timeout 1500 python scripts/ab_batch.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = 8


def _time(fn, *args, n=10):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from revo_tpu import tracker
    from revo_tpu.config import SystemConfig
    from revo_tpu.frontend import build_frame, make_keyframe
    from revo_tpu.io.synthetic import SyntheticScene, render_sequence

    base = SystemConfig()
    frames = list(render_sequence(SyntheticScene(), base.camera, 2, seed=0))
    g1 = frames[1][0].astype(np.uint8)
    d1 = (frames[1][1] * base.dataset.depth_scale_factor).astype(np.uint16)
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), base)
    gb = jax.device_put(jnp.stack([jnp.asarray(g1)] * B))
    db = jax.device_put(jnp.stack([jnp.asarray(d1)] * B))
    Rb = jax.device_put(jnp.stack([jnp.eye(3)] * B))
    tb = jax.device_put(jnp.stack([jnp.zeros(3)] * B))

    def cfg_with(compaction="rank", **kw):
        return dataclasses.replace(
            base,
            pyramid=dataclasses.replace(base.pyramid, compaction=compaction),
            tracker=dataclasses.replace(
                base.tracker,
                optimizer=dataclasses.replace(
                    base.tracker.optimizer, solver="gn_fixed", **kw
                ),
            ),
        )

    # Re-adjudication of every gather form against the FIXED use_quad gate
    # (tracker.py once sent all suffixed variants the take4 fallback).
    variants = [
        ("rank+dt4bf+take", cfg_with(
            compaction="rank", quad_form="dt4bf", bilinear_impl="quad")),
        ("rank+dt4bf+ob",   cfg_with(
            compaction="rank", quad_form="dt4bf", bilinear_impl="quad_ob")),
        ("rank+dt4bf+fr",   cfg_with(
            compaction="rank", quad_form="dt4bf", bilinear_impl="quad_fr")),
        ("rank+dt4bf+lf",   cfg_with(
            compaction="rank", quad_form="dt4bf", bilinear_impl="quad_lf")),
        ("rank+dt4bf+lf12", cfg_with(
            compaction="rank", quad_form="dt4bf", bilinear_impl="quad_lf12")),
        # Context re-adjudication under the lf winner (the emitter is
        # context-dependent; scatter-vs-rank was last judged pre-lf).
        ("scat+dt4bf+lf",   cfg_with(
            compaction="scatter", quad_form="dt4bf",
            bilinear_impl="quad_lf")),
        ("rank+dt4+lf",     cfg_with(
            compaction="rank", quad_form="dt4", bilinear_impl="quad_lf")),
    ]
    for name, c in variants:
        kf = make_keyframe(f0, jnp.eye(4), c)
        kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
        jax.block_until_ready(kfb.structs)

        def step(gg, dd, k, R, t, c=c):
            f = build_frame(gg, dd, c)
            return tracker.track_frames(k, f, R, t, c)

        vstep = jax.jit(jax.vmap(step))
        ms = _time(vstep, gb, db, kfb, Rb, tb)
        print(
            f"{name:12s} {ms:7.1f} ms/batched-step  "
            f"(agg {B / ms * 1e3:6.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
