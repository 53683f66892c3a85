"""Staged-delta bisection of the per-frame step on the real chip.

Times cumulative prefixes of the build+track pipeline, each as ONE jitted
call (the tunnel adds ~2 ms per dispatch, so per-op timing lies; prefix
deltas inside single jits don't).  Run on TPU:

    timeout 560 python scripts/profile_stages.py

Prints one line per stage: cumulative ms and delta vs previous stage.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time_fn(fn, *args, n=24):
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

    from revo_tpu import ops, tracker
    from revo_tpu.config import SystemConfig
    from revo_tpu.frontend import build_frame, make_keyframe
    from revo_tpu.io.synthetic import SyntheticScene, render_sequence

    cfg = SystemConfig()
    scene = SyntheticScene()
    frames = list(render_sequence(scene, cfg.camera, 2, seed=0))
    g_u8 = [f[0].astype(np.uint8) for f in frames]
    d_u16 = [
        (f[1] * cfg.dataset.depth_scale_factor).astype(np.uint16)
        for f in frames
    ]

    f0 = build_frame(jax.device_put(g_u8[0]), jax.device_put(d_u16[0]), cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    jax.block_until_ready(kf.structs)
    R0 = jax.device_put(jnp.eye(3))
    t0v = jax.device_put(jnp.zeros(3))
    g = jax.device_put(g_u8[1])
    d = jax.device_put(d_u16[1])

    pyr = cfg.pyramid
    cams = cfg.camera_pyramid()
    use_pallas = pyr.use_pallas_canny and jax.default_backend() == "tpu"
    if use_pallas:
        from revo_tpu.ops.pallas.canny_kernel import canny_pallas as canny_fn
    else:
        canny_fn = ops.canny

    # Cumulative prefixes of build_frame's per-level work.  Each returns a
    # small reduction so XLA cannot dead-code-eliminate the stage.
    def _convert(gray, depth):
        gray = gray.astype(jnp.float32)
        depth = depth.astype(jnp.float32) * (
            1.0 / cfg.dataset.depth_scale_factor
        )
        return gray, depth

    @jax.jit
    def s0(gray, depth):
        gray, depth = _convert(gray, depth)
        return gray.sum() + depth.sum()

    @jax.jit
    def s1(gray, depth):
        gray, depth = _convert(gray, depth)
        acc = gray.sum() + depth.sum()
        gl, dl = gray, depth
        for lvl in range(pyr.n_levels - 1):
            gl = ops.pyr_down(gl)
            dl = ops.subsample_depth_with_holes(dl)
            acc = acc + gl.sum() + dl.sum()
        return acc

    def _levels(gray, depth):
        gl, dl = gray, depth
        out = [(gl, dl)]
        for lvl in range(pyr.n_levels - 1):
            gl = ops.pyr_down(gl)
            dl = ops.subsample_depth_with_holes(dl)
            out.append((gl, dl))
        return out

    @jax.jit
    def s2(gray, depth):
        gray, depth = _convert(gray, depth)
        acc = jnp.float32(0)
        for gl, dl in _levels(gray, depth):
            e = canny_fn(gl, pyr.canny_threshold1, pyr.canny_threshold2)
            acc = acc + e.sum()
        return acc

    @jax.jit
    def s3(gray, depth):
        gray, depth = _convert(gray, depth)
        acc = jnp.float32(0)
        prev = None
        for lvl, (gl, dl) in enumerate(_levels(gray, depth)):
            e = canny_fn(gl, pyr.canny_threshold1, pyr.canny_threshold2)
            patch = pyr.dist_patch_sizes[lvl]
            counts, occ = ops.patch_histogram(e, patch)
            if pyr.use_edge_hist and lvl > 0:
                filled = ops.fill_in_edges(
                    e, prev, counts, patch, pyr.dist_patch_sizes[lvl - 1]
                )
                e = jnp.where(occ < pyr.n_percentage, filled, e)
            prev = e
            acc = acc + e.sum()
        return acc

    @jax.jit
    def s4(gray, depth):
        f = build_frame(gray, depth, cfg)
        return sum(lv.cloud.points.sum() for lv in f.levels)

    @jax.jit
    def s5(gray, depth, kf_, R, t):
        f = build_frame(gray, depth, cfg)
        res = tracker.track_frames(kf_, f, R, t, cfg)
        return res

    stages = [
        ("convert", lambda: _time_fn(s0, g, d)),
        ("+pyramid", lambda: _time_fn(s1, g, d)),
        ("+canny", lambda: _time_fn(s2, g, d)),
        ("+hist/fill", lambda: _time_fn(s3, g, d)),
        ("+backproject(=build)", lambda: _time_fn(s4, g, d)),
        ("+track(=full step)", lambda: _time_fn(s5, g, d, kf, R0, t0v)),
    ]
    last = 0.0
    for name, run in stages:
        ms = run()
        print(f"{name:24s} {ms:7.2f} ms   (delta {ms - last:+6.2f})",
              flush=True)
        last = ms


if __name__ == "__main__":
    main()
