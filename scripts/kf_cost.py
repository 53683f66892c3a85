"""Keyframe-promotion cost on TPU at 640x480 (VERDICT round 1 #4 "measure
make_keyframe/promotion cost"): times the fused DT+gradient+quad-table
build (ops.edt banded sweep) single and vmapped B=8, plus the full
promoted scan step vs the normal scan step.

    timeout 590 python scripts/kf_cost.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu.config import SystemConfig
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main(section: str = "all"):
    cfg = SystemConfig()
    frames = list(render_sequence(SyntheticScene(), cfg.camera, 2, seed=0))
    f0 = build_frame(
        jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg
    )
    jax.block_until_ready(f0.levels[0].gray)

    mk = jax.jit(lambda f: make_keyframe(f, jnp.eye(4), cfg))
    if section in ("all", "mk"):
        ms = timeit(mk, f0)
        print(f"make_keyframe 640x480 (3 levels, DT+grad+quad): {ms:.2f} ms")

        B = 8
        fb = jax.tree.map(lambda x: jnp.stack([x] * B), f0)
        mkb = jax.jit(jax.vmap(lambda f: make_keyframe(f, jnp.eye(4), cfg)))
        msb = timeit(mkb, fb)
        print(f"make_keyframe vmapped B=8: {msb:.2f} ms ({msb / B:.2f} ms/seq)")
    if section == "mk":
        return

    # Full step cost with and without the promotion branch taken: the
    # promoted scan step = make_keyframe + a second track.
    from revo_tpu import tracker

    kf = mk(f0)
    jax.block_until_ready(kf.structs)
    g1 = jnp.asarray(frames[1][0].astype(np.uint8))
    d1 = jnp.asarray(
        (frames[1][1] * cfg.dataset.depth_scale_factor).astype(np.uint16)
    )

    def step(g, d, k):
        f = build_frame(g, d, cfg)
        return tracker.track_frames(k, f, jnp.eye(3), jnp.zeros(3), cfg)

    def step_promoted(g, d, k):
        f = build_frame(g, d, cfg)
        r1 = tracker.track_frames(k, f, jnp.eye(3), jnp.zeros(3), cfg)
        k2 = make_keyframe(f, jnp.eye(4), cfg)
        r2 = tracker.track_frames(k2, f, r1.R, r1.t, cfg)
        return r2

    ms_n = timeit(jax.jit(step), g1, d1, kf)
    ms_p = timeit(jax.jit(step_promoted), g1, d1, kf)
    print(f"normal step: {ms_n:.2f} ms;  promoted step: {ms_p:.2f} ms "
          f"(promotion overhead {ms_p - ms_n:.2f} ms)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
