"""Measure lax.while_loop vs fori_loop iteration overhead on the TPU.

    timeout 600 python scripts/loopbench.py
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

    x0 = jax.device_put(jnp.ones((8, 128), jnp.float32))
    n_iter = jax.device_put(jnp.int32(30))

    @jax.jit
    def wl_tiny(x, n):
        def cond(s):
            return s[1] < n

        def body(s):
            return (s[0] * 1.0001 + 0.1, s[1] + 1)

        return jax.lax.while_loop(cond, body, (x, jnp.int32(0)))[0].sum()

    @jax.jit
    def fl_tiny(x):
        def body(i, a):
            return a * 1.0001 + 0.1

        return jax.lax.fori_loop(0, 30, body, x).sum()

    # while_loop whose body is a realistic residual-pass-sized workload
    rng = np.random.default_rng(0)
    struct = jax.device_put(jnp.asarray(rng.random((480, 640, 3)), jnp.float32))
    pts = jax.device_put(
        jnp.asarray(rng.random((24576, 3)) + 0.5, jnp.float32)
    )

    from revo_tpu.config import SystemConfig
    from revo_tpu.ops.backproject import EdgeCloud
    from revo_tpu import solver

    cfg = SystemConfig()
    cloud = EdgeCloud(points=pts, valid=jnp.ones(24576, bool),
                      count=jnp.int32(24576))

    @jax.jit
    def wl_respass(s, n):
        def cond(c):
            return c[1] < n

        def body(c):
            acc, i = c
            sys_ = solver.residual_system(
                s, cloud, cfg.camera, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err, i + 1

        return jax.lax.while_loop(cond, body, (jnp.float32(0), jnp.int32(0)))[0]

    @jax.jit
    def fl_respass(s):
        def body(i, acc):
            sys_ = solver.residual_system(
                s, cloud, cfg.camera, jnp.eye(3), jnp.zeros(3) + acc * 1e-9,
                30.0, 0.3, True,
            )
            return acc + sys_.err

        return jax.lax.fori_loop(0, 30, body, jnp.float32(0))

    print(f"while 30x tiny body      {_time(wl_tiny, x0, n_iter):7.3f} ms",
          flush=True)
    print(f"fori  30x tiny body      {_time(fl_tiny, x0):7.3f} ms", flush=True)
    print(f"while 30x residual pass  {_time(wl_respass, struct, n_iter):7.3f} ms",
          flush=True)
    print(f"fori  30x residual pass  {_time(fl_respass, struct):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
