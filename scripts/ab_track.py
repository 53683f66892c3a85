"""In-context A/B of solver knobs: full (build+track) step per config.

    timeout 1500 python scripts/ab_track.py
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, n=24):
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
    g = jax.device_put(frames[1][0].astype(np.uint8))
    d = jax.device_put(
        (frames[1][1] * base.dataset.depth_scale_factor).astype(np.uint16)
    )
    f0 = build_frame(jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), base)
    kf = make_keyframe(f0, jnp.eye(4), base)
    jax.block_until_ready(kf.structs)
    R0 = jax.device_put(jnp.eye(3))
    t0v = jax.device_put(jnp.zeros(3))

    @functools.partial(jax.jit, static_argnames=("c",))
    def step(gg, dd, kf_, R, t, c):
        f = build_frame(gg, dd, c)
        return tracker.track_frames(kf_, f, R, t, c)

    def cfg_with(compaction="rank", **kw):
        return dataclasses.replace(
            base,
            pyramid=dataclasses.replace(base.pyramid, compaction=compaction),
            tracker=dataclasses.replace(
                base.tracker,
                optimizer=dataclasses.replace(base.tracker.optimizer, **kw),
            ),
        )

    variants = [
        ("rank+dt4bf+lm", cfg_with(compaction="rank", quad_form="dt4bf")),
        ("rank+dt4bf+gn", cfg_with(
            compaction="rank", quad_form="dt4bf", solver="gn_fixed")),
        # Gather forms in the single-seq context (the batched context picks
        # independently — see ab_batch.py; the emitter flips between them).
        ("rank+dt4bf+gn+fr", cfg_with(
            compaction="rank", quad_form="dt4bf", solver="gn_fixed",
            bilinear_impl="quad_fr")),
        ("rank+dt4bf+gn+lf", cfg_with(
            compaction="rank", quad_form="dt4bf", solver="gn_fixed",
            bilinear_impl="quad_lf")),
    ]
    for name, c in variants:
        kf = make_keyframe(f0, jnp.eye(4), c)
        jax.block_until_ready(kf.structs)
        ms = _time(step, g, d, kf, R0, t0v, c)
        print(f"{name:20s} {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
