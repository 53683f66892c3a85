"""Figure out why loopbench2 read ~0: A/B known-good vs new formulation."""
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
    cloud = EdgeCloud(points=pts, valid=valid, count=jnp.int32(P))

    # A: solver.residual_system with closed-over cloud (known-good 0.63ms)
    @jax.jit
    def runA(s):
        def body(i, acc):
            sys_ = solver.residual_system(
                s, cloud, cam, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    # B: same but cloud as argument
    @jax.jit
    def runB(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))

        def body(i, acc):
            sys_ = solver.residual_system(
                s, c, cam, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    # C: loopbench2-style hand-rolled residual, cloud as arg, 1e-3 coupling
    def residual_with(sample_fn, s, p, va, t):
        wxp = p + t
        px, py, pz = wxp[:, 0], wxp[:, 1], wxp[:, 2]
        pz_safe = jnp.where(pz == 0, 1e-12, pz)
        u = px / pz_safe * cam.fx + cam.cx
        v = py / pz_safe * cam.fy + cam.cy
        inb = (u > 1.0) & (v > 1.0) & (u < W - 2.0) & (v < H - 2.0) & va
        samp = sample_fn(s, u, v)
        r = samp[:, 2]
        gx = cam.fx * samp[:, 0]
        gy = cam.fy * samp[:, 1]
        good = inb & (r <= 30.0)
        wg = jnp.where(r <= 0.3, 1.0, 0.3 / jnp.where(r == 0, 1.0, r))
        wg = wg * good.astype(jnp.float32)
        iz = 1.0 / pz_safe
        iz2 = iz * iz
        J = jnp.stack(
            [
                iz * gx,
                iz * gy,
                (-px * iz2) * gx + (-py * iz2) * gy,
                (-px * py * iz2) * gx - (1.0 + py * py * iz2) * gy,
                (1.0 + px * px * iz2) * gx + (px * py * iz2) * gy,
                (-py * iz) * gx + (px * iz) * gy,
            ],
            axis=-1,
        )
        A = jnp.einsum("pi,pj->ij", J * wg[:, None], J,
                       precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("pi,p->i", J, wg * r,
                       precision=jax.lax.Precision.HIGHEST)
        return A.sum() + g.sum()

    @jax.jit
    def runC(s, p, va):
        def body(i, acc):
            return acc + residual_with(
                interp.bilinear_sample, s, p, va, jnp.zeros(3) + acc * 1e-3
            )

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    # D: window-gather sampling inside solver.residual_system via patching
    orig = solver.bilinear_sample
    solver.bilinear_sample = interp.bilinear_sample_window

    @jax.jit
    def runD(s, p, va):
        c = EdgeCloud(points=p, valid=va, count=jnp.int32(P))

        def body(i, acc):
            sys_ = solver.residual_system(
                s, c, cam, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    tD = _time(runD, struct, pts, valid)
    solver.bilinear_sample = orig

    print(f"A solver, closed-over cloud   {_time(runA, struct):7.2f} ms/30",
          flush=True)
    print(f"B solver, cloud as arg        {_time(runB, struct, pts, valid):7.2f} ms/30",
          flush=True)
    print(f"C handrolled, arg, 1e-3       {_time(runC, struct, pts, valid):7.2f} ms/30",
          flush=True)
    print(f"D solver + window gather      {tD:7.2f} ms/30", flush=True)


if __name__ == "__main__":
    main()
