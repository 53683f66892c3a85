"""Bisect why bilinear_sample_window is fast in a fori harness but
catastrophic inside the real tracker step.

Variants (all 30 chained residual passes unless noted):
  E  window gather in lax.while_loop        (loop-type effect)
  F  window gather, struct produced by a jit (layout effect)
  G  real lm_level with device_put struct    (lm_level structure)
  T4 take4 control in fori                   (baseline)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, n=8):
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

    from revo_tpu.config import SystemConfig
    from revo_tpu.ops import interp
    from revo_tpu.ops.backproject import EdgeCloud
    from revo_tpu import solver

    cfg = SystemConfig()
    cam = cfg.camera
    H, W, P = cam.height, cam.width, 24576
    rng = np.random.default_rng(0)
    struct = jax.device_put(jnp.asarray(rng.random((H, W, 3)), jnp.float32))
    pts = jax.device_put(
        jnp.asarray(
            np.stack(
                [
                    (rng.random(P) - 0.5) * 2.0,
                    (rng.random(P) - 0.5) * 1.5,
                    rng.random(P) * 3.0 + 0.5,
                ],
                -1,
            ),
            jnp.float32,
        )
    )
    valid = jax.device_put(jnp.ones(P, bool))

    def loop_body_fori(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))

        def body(i, acc):
            sys_ = solver.residual_system(
                s, c, cam, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    def loop_body_while(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))

        def cond(st):
            return st[1] < 30

        def body(st):
            acc, i = st
            sys_ = solver.residual_system(
                s, c, cam, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err, i + 1

        return jax.lax.while_loop(cond, body, (jnp.float32(0), jnp.int32(0)))[0]

    runE_f = jax.jit(loop_body_fori)
    runE_w = jax.jit(loop_body_while)

    @jax.jit
    def make_struct(s):
        return s * 1.0000001 + 0.0000001  # jit-produced layout

    struct_jit = make_struct(struct)
    jax.block_until_ready(struct_jit)

    @jax.jit
    def runG(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))
        R, t, err, info = solver.lm_level(
            s, c, cam, jnp.eye(3), jnp.zeros(3), cfg.tracker.optimizer, 0
        )
        return err + t.sum()

    print("(window gather active in solver)", flush=True)
    print(f"E fori  window           {_time(runE_f, struct, pts, valid):8.2f} ms/30", flush=True)
    print(f"E while window           {_time(runE_w, struct, pts, valid):8.2f} ms/30", flush=True)
    print(f"F fori  window jitstruct {_time(runE_f, struct_jit, pts, valid):8.2f} ms/30", flush=True)
    print(f"G lm_level window        {_time(runG, struct, pts, valid):8.2f} ms", flush=True)

    solver.bilinear_sample = interp.bilinear_sample  # take4

    runT_f = jax.jit(loop_body_fori)

    @jax.jit
    def runG4(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))
        R, t, err, info = solver.lm_level(
            s, c, cam, jnp.eye(3), jnp.zeros(3), cfg.tracker.optimizer, 0
        )
        return err + t.sum()

    print(f"T4 fori take4            {_time(runT_f, struct, pts, valid):8.2f} ms/30", flush=True)
    print(f"G4 lm_level take4        {_time(runG4, struct, pts, valid):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
