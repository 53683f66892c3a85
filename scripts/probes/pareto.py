"""Pareto probe: capacity margin vs batch8 chained throughput + chain ATE.

The autotune margin deliberately under-sizes the edge-cloud capacities, so
the rank compaction's uniform stride decimation becomes a spatial
subsampler; solver gather cost is per-index, so throughput scales with
capacity while ATE degrades only once decimation starves the alignment
(VERDICT r4 #1: only margins 1.1 and 0.5 had measured points — map the
curve so the default operating point can sit at the knee).

Protocol: EXACTLY bench.py's headline section (phase_stack varying-frame
scan chains, hard_sync fetch timing, divergence guard) per margin.  Prints
one JSON line per margin.  Run on the TPU:

    timeout 580 python scripts/probes/pareto.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import bench  # noqa: E402  (chain scaffolding + tunnel health gates)

MARGINS = [float(x) for x in (
    os.environ.get("PARETO_MARGINS") or "1.10 0.80 0.65 0.50 0.35"
).split()]


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
    g_u8 = [g.astype(np.uint8) for g in grays]
    d_u16 = [
        (d * base.dataset.depth_scale_factor).astype(np.uint16)
        for d in depths
    ]
    g_dev = [jax.device_put(x) for x in g_u8]
    d_dev = [jax.device_put(x) for x in d_u16]
    B = 8
    on_tpu = jax.default_backend() not in ("cpu",)

    for margin in MARGINS:
        cfg = calibrate_capacities(base, grays[:2], depths[:2], margin=margin)
        cfg_b = bench._batched_cfg(cfg)

        @functools.partial(jax.jit, static_argnames=("c",))
        def vo_step(g, d, kf, R0, t0, c):
            f = build_frame(g, d, c)
            return tracker.track_frames(kf, f, R0, t0, c)

        f0 = build_frame(g_dev[0], d_dev[0], cfg)
        kf = make_keyframe(f0, jnp.eye(4), cfg)
        jax.block_until_ready(kf.structs)
        kfb = jax.tree.map(lambda x: jnp.stack([x] * B), kf)

        if on_tpu:
            bench._wait_for_healthy_tunnel(max_wait_s=90.0)

        # Batched chain (the headline protocol: lane 0 walks the plain
        # trajectory, so the same dispatch certifies its ATE).
        batched = bench.chain_of(
            jax.vmap(lambda g, d, k, R, t: vo_step(g, d, k, R, t, cfg_b))
        )
        xb_g = bench.phase_stack(g_dev, B, bench.N_FRAMES)
        xb_d = bench.phase_stack(d_dev, B, bench.N_FRAMES)
        t_compile = time.perf_counter()
        batch_fps, r = bench._time_chain(
            batched,
            (xb_g, xb_d, kfb, jnp.stack([jnp.eye(3)] * B),
             jnp.stack([jnp.zeros(3)] * B)),
            3, B * bench.N_FRAMES, f"pareto_b8_m{margin}",
        )
        ate_b = bench._ate_m(r, gt, lane=0)

        # Single-sequence chain (default LM solver, replay mode).
        single = bench.chain_of(
            lambda g, d, k, R, t: vo_step(g, d, k, R, t, cfg)
        )
        single_fps, rs = bench._time_chain(
            single,
            (jnp.stack(g_dev), jnp.stack(d_dev), kf, jnp.eye(3),
             jnp.zeros(3)),
            3, bench.N_FRAMES, f"pareto_s_m{margin}",
        )
        ate_s = bench._ate_m(rs, gt)
        print(json.dumps({
            "margin": margin,
            "caps": list(cfg.pyramid.edge_capacity),
            "batch8_agg_fps": round(batch_fps, 1),
            "batch8_ms_per_step": round(B * 1000.0 / batch_fps, 2),
            "ate_batch8_m": round(ate_b, 6),
            "single_scan_fps": round(single_fps, 1),
            "ate_single_m": round(ate_s, 6),
            "platform": jax.default_backend(),
            "section_s": round(time.perf_counter() - t_compile, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
