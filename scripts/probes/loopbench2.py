"""In-loop (dynamic-index) cost of residual-pass sampling variants.

Each candidate: 30 chained residual passes inside one jitted fori_loop,
pose perturbed by the running accumulator so nothing constant-folds.

    timeout 1100 python scripts/loopbench2.py
"""
from __future__ import annotations

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

    from revo_tpu.config import SystemConfig
    from revo_tpu.ops import interp

    cfg = SystemConfig()
    cam = cfg.camera
    H, W = cam.height, cam.width
    rng = np.random.default_rng(0)
    struct = jax.device_put(jnp.asarray(rng.random((H, W, 3)), jnp.float32))
    P = 24576
    pts_np = np.stack(
        [
            (rng.random(P) - 0.5) * 2.0,
            (rng.random(P) - 0.5) * 1.5,
            rng.random(P) * 3.0 + 0.5,
        ],
        axis=-1,
    ).astype(np.float32)
    pts = jax.device_put(jnp.asarray(pts_np))
    valid = jax.device_put(jnp.ones(P, bool))

    def residual_with(sample_fn, struct_, pts_, valid_, t):
        wxp = pts_ + t  # cheap pose model; enough to keep indices dynamic
        px, py, pz = wxp[:, 0], wxp[:, 1], wxp[:, 2]
        pz_safe = jnp.where(pz == 0, 1e-12, pz)
        u = px / pz_safe * cam.fx + cam.cx
        v = py / pz_safe * cam.fy + cam.cy
        inb = (u > 1.0) & (v > 1.0) & (u < W - 2.0) & (v < H - 2.0) & valid_
        samp = sample_fn(struct_, u, v)
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

    def make(fn, struct_arr, pts_arr):
        @jax.jit
        def run(s, p, va):
            def body(i, acc):
                return acc + residual_with(
                    fn, s, p, va, jnp.zeros(3) + acc * 1e-12
                )

            return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

        return lambda: _time(run, struct_arr, pts_arr, valid)

    # planar variant: 3 x (H*W,) channel tables
    struct_planar = jax.device_put(
        jnp.moveaxis(jnp.asarray(rng.random((H, W, 3)), jnp.float32), -1, 0)
        .reshape(3, H * W)
    )

    def sample_planar(sp, u, v):
        ix = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
        iy = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
        dx = u - ix
        dy = v - iy
        base = iy * W + ix
        g00 = sp[:, base]
        g01 = sp[:, base + 1]
        g10 = sp[:, base + W]
        g11 = sp[:, base + W + 1]
        dxdy = dx * dy
        out = (
            dxdy * g11
            + (dy - dxdy) * g10
            + (dx - dxdy) * g01
            + (1.0 - dx - dy + dxdy) * g00
        )
        return out.T

    @jax.jit
    def run_planar(sp, p, va):
        def body(i, acc):
            return acc + residual_with(
                sample_planar, sp, p, va, jnp.zeros(3) + acc * 1e-12
            )

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    struct_bf16 = struct.astype(jnp.bfloat16)

    def sample_take4_bf16(s, u, v):
        return interp.bilinear_sample(s.astype(jnp.float32), u, v)

    def sample_take4_bf16_native(s, u, v):
        # gather in bf16, convert after
        h, w = s.shape[0], s.shape[1]
        ix = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        iy = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        dx = (u - ix)[:, None]
        dy = (v - iy)[:, None]
        flat = s.reshape(h * w, -1)
        base = iy * w + ix
        i00 = jnp.take(flat, base, axis=0).astype(jnp.float32)
        i01 = jnp.take(flat, base + 1, axis=0).astype(jnp.float32)
        i10 = jnp.take(flat, base + w, axis=0).astype(jnp.float32)
        i11 = jnp.take(flat, base + w + 1, axis=0).astype(jnp.float32)
        dxdy = dx * dy
        return (
            dxdy * i11
            + (dy - dxdy) * i10
            + (dx - dxdy) * i01
            + (1.0 - dx - dy + dxdy) * i00
        )

    pts_half = jax.device_put(jnp.asarray(pts_np[:12288]))
    valid_half = jax.device_put(jnp.ones(12288, bool))

    @jax.jit
    def run_half(s, p, va):
        def body(i, acc):
            return acc + residual_with(
                interp.bilinear_sample, s, p, va, jnp.zeros(3) + acc * 1e-12
            )

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    results = []
    results.append(("take4 interleaved", make(interp.bilinear_sample, struct, pts)()))
    results.append(("window gather 2x2x3", make(interp.bilinear_sample_window, struct, pts)()))
    results.append(("planar 12 gathers", _time(run_planar, struct_planar, pts, valid)))
    results.append(("take4 bf16 table", make(sample_take4_bf16_native, struct_bf16, pts)()))
    results.append(("take4 P=12288", _time(run_half, struct, pts_half, valid_half)))

    for name, ms in results:
        print(f"{name:24s} {ms:7.2f} ms / 30 iters = {ms/30*1000:6.0f} us/pass",
              flush=True)


if __name__ == "__main__":
    main()
