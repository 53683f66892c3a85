"""Batch-size scaling at the knee margin (round 5): the B=32 cliff was
layout-copy materialization growing ~B^2 with the lane-fold table size
(STATUS round-3) — knee capacities shrink that table ~40%, so the
per-chip optimum B may move.  bench chain protocol per B.

    timeout 580 python scripts/probes/pareto_bsize.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import bench  # noqa: E402

BS = [int(x) for x in (os.environ.get("PARETO_BS") or "8 16 32").split()]
MARGIN = float(os.environ.get("PARETO_MARGIN", "0.65"))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from revo_tpu import tracker
    from revo_tpu.autotune import calibrate_capacities
    from revo_tpu.config import SystemConfig
    from revo_tpu.frontend import build_frame, make_keyframe

    bench._enable_compile_cache()
    base = SystemConfig()
    grays, depths, gt = bench._build_inputs(base)
    cfg = calibrate_capacities(base, grays[:2], depths[:2], margin=MARGIN)
    cfg_b = bench._batched_cfg(cfg)
    g_dev = [jax.device_put(g.astype(np.uint8)) for g in grays]
    d_dev = [
        jax.device_put(
            (d * base.dataset.depth_scale_factor).astype(np.uint16)
        )
        for d in depths
    ]

    @functools.partial(jax.jit, static_argnames=("c",))
    def vo_step(g, d, kf, R0, t0, c):
        f = build_frame(g, d, c)
        return tracker.track_frames(kf, f, R0, t0, c)

    f0 = build_frame(g_dev[0], d_dev[0], cfg)
    kf = make_keyframe(f0, jnp.eye(4), cfg)
    jax.block_until_ready(kf.structs)
    on_tpu = jax.default_backend() not in ("cpu",)

    for B in BS:
        kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)
        batched = bench.chain_of(
            jax.vmap(lambda g, d, k, R, t: vo_step(g, d, k, R, t, cfg_b))
        )
        xb_g = bench.phase_stack(g_dev, B, bench.N_FRAMES)
        xb_d = bench.phase_stack(d_dev, B, bench.N_FRAMES)
        if on_tpu:
            bench._wait_for_healthy_tunnel(max_wait_s=90.0)
        t0 = time.perf_counter()
        fps, r = bench._time_chain(
            batched,
            (xb_g, xb_d, kfb, jnp.stack([jnp.eye(3)] * B),
             jnp.stack([jnp.zeros(3)] * B)),
            3, B * bench.N_FRAMES, f"bsize{B}",
        )
        print(json.dumps({
            "B": B,
            "margin": MARGIN,
            "agg_fps": round(fps, 1),
            "ms_per_batched_step": round(B * bench.N_FRAMES * 1000.0
                                         / fps / bench.N_FRAMES, 2),
            "ate_lane0_m": round(bench._ate_m(r, gt, lane=0), 6),
            "spread_ms": bench._LAST_SPREAD_MS.get(f"bsize{B}"),
            "section_s": round(time.perf_counter() - t0, 1),
            "platform": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
