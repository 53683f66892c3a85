"""One-off TPU microbenchmarks for hot-op design choices.

Each candidate runs as ONE jitted call per timing rep (tunnel adds ~2 ms
per dispatch; compare candidates by their delta from the `noop` line).

    timeout 1100 python scripts/microbench.py
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

    H, W, CAP = 480, 640, 24576
    rng = np.random.default_rng(0)
    mask_np = (rng.random((H, W)) < 0.05).astype(np.float32)
    depth_np = rng.random((H, W)).astype(np.float32) + 0.5
    struct_np = rng.random((H, W, 3)).astype(np.float32)
    u_np = rng.random(CAP).astype(np.float32) * (W - 4) + 1.5
    v_np = rng.random(CAP).astype(np.float32) * (H - 4) + 1.5

    mask = jax.device_put(jnp.asarray(mask_np) > 0)
    depth = jax.device_put(jnp.asarray(depth_np))
    struct = jax.device_put(jnp.asarray(struct_np))
    uu = jax.device_put(jnp.asarray(u_np))
    vv = jax.device_put(jnp.asarray(v_np))

    results = {}

    @jax.jit
    def noop(m):
        return m.sum()

    results["noop"] = _time(noop, mask)

    # ---- compaction candidates ----
    @jax.jit
    def compact_nonzero(m, d):
        (idx,) = jnp.nonzero(m.ravel(), size=CAP, fill_value=0)
        return idx.sum() + d.ravel()[idx].sum()

    @jax.jit
    def compact_cumsum_scatter(m, d):
        flat = m.ravel()
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1  # inclusive-1
        tgt = jnp.where(flat & (pos < CAP), pos, CAP)
        idx = (
            jnp.zeros(CAP + 1, jnp.int32)
            .at[tgt]
            .set(jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop")
        )[:CAP]
        return idx.sum() + d.ravel()[idx].sum()

    @jax.jit
    def cumsum_only(m):
        return jnp.cumsum(m.ravel().astype(jnp.int32))[-1]

    @jax.jit
    def rowwise_cumsum(m):
        # axis-1 cumsum + row totals + 480-cumsum (the dense part of a
        # two-level compaction)
        c = jnp.cumsum(m.astype(jnp.int32), axis=1)
        rows = c[:, -1]
        base = jnp.cumsum(rows)
        return c.sum() + base[-1]

    results["compact_nonzero"] = _time(compact_nonzero, mask, depth)
    results["compact_cumsum_scatter"] = _time(
        compact_cumsum_scatter, mask, depth
    )
    results["cumsum_flat_307k"] = _time(cumsum_only, mask)
    results["rowwise_cumsum"] = _time(rowwise_cumsum, mask)

    # ---- patch histogram candidates (patch=20) ----
    P = 20
    hp, wp = H // P, W // P

    @jax.jit
    def hist_reshape(m):
        e = m[: hp * P, : wp * P].astype(jnp.int32)
        c = e.reshape(hp, P, wp, P).sum(axis=(1, 3))
        return c.sum() + (c > 0).sum()

    Ih = np.zeros((hp, H), np.float32)
    for k in range(hp):
        Ih[k, k * P : (k + 1) * P] = 1.0
    Iw = np.zeros((wp, W), np.float32)
    for k in range(wp):
        Iw[k, k * P : (k + 1) * P] = 1.0
    Ih_d = jax.device_put(jnp.asarray(Ih))
    Iw_d = jax.device_put(jnp.asarray(Iw))

    @jax.jit
    def hist_matmul(m, ih, iw):
        e = m.astype(jnp.float32)
        c = ih @ e @ iw.T
        return c.sum() + (c > 0.5).sum()

    results["hist_reshape"] = _time(hist_reshape, mask)
    results["hist_matmul"] = _time(hist_matmul, mask, Ih_d, Iw_d)

    # ---- bilinear sample candidates ----
    @jax.jit
    def sample_4take(s, u, v):
        from revo_tpu.ops.interp import bilinear_sample

        return bilinear_sample(s, u, v).sum()

    @jax.jit
    def sample_gather22(s, u, v):
        h, w = s.shape[:2]
        ix = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        iy = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        dx = (u - ix)[:, None]
        dy = (v - iy)[:, None]
        starts = jnp.stack([iy, ix], axis=-1)
        win = jax.lax.gather(
            s,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(2, 2, 3),
            mode="clip",
        )  # (N, 2, 2, 3)
        dxdy = dx * dy
        out = (
            dxdy * win[:, 1, 1]
            + (dy - dxdy) * win[:, 1, 0]
            + (dx - dxdy) * win[:, 0, 1]
            + (1 - dx - dy + dxdy) * win[:, 0, 0]
        )
        return out.sum()

    @jax.jit
    def sample_1take_rows(s, u, v):
        # gather whole 2-row x 2-col slices channel-planar: planar layout
        h, w = s.shape[:2]
        sp = jnp.moveaxis(s, -1, 0).reshape(3, h * w)
        ix = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
        iy = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
        dx = u - ix
        dy = v - iy
        base = iy * w + ix
        g00 = sp[:, base]
        g01 = sp[:, base + 1]
        g10 = sp[:, base + w]
        g11 = sp[:, base + w + 1]
        dxdy = dx * dy
        out = (
            dxdy * g11
            + (dy - dxdy) * g10
            + (dx - dxdy) * g01
            + (1 - dx - dy + dxdy) * g00
        )
        return out.sum()

    results["sample_4take_interleaved"] = _time(sample_4take, struct, uu, vv)
    results["sample_gather_2x2x3"] = _time(sample_gather22, struct, uu, vv)
    results["sample_4take_planar"] = _time(sample_1take_rows, struct, uu, vv)

    # ---- residual pass cost ----
    from revo_tpu.config import SystemConfig
    from revo_tpu.ops.backproject import EdgeCloud
    from revo_tpu import solver

    cfg = SystemConfig()
    cloud = EdgeCloud(
        points=jax.device_put(
            jnp.asarray(rng.random((CAP, 3)).astype(np.float32) + 0.5)
        ),
        valid=jax.device_put(jnp.ones(CAP, bool)),
        count=jnp.int32(CAP),
    )

    @jax.jit
    def respass(s, c):
        sys_ = solver.residual_system(
            s, c, cfg.camera, jnp.eye(3), jnp.zeros(3), 30.0, 0.3, True
        )
        return sys_.err + sys_.A.sum()

    results["residual_pass_24k"] = _time(respass, struct, cloud)

    for k, v in results.items():
        print(f"{k:28s} {v:7.3f} ms  (delta {v - results['noop']:+7.3f})",
              flush=True)


if __name__ == "__main__":
    main()
