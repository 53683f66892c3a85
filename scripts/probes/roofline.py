"""Roofline arithmetic for the tracking step (VERDICT r2 item 3b).

Computes the ANALYTIC per-step gather-index count and gathered bytes from
the config (solver evaluations x per-level capacities + compaction row
takes), to pair with MEASURED per-HLO gather time from
scripts/trace_batch.py — so "~X% of the gather-emitter ceiling" is
arithmetic, not assertion.

Host-only (no device needed):

    python scripts/probes/roofline.py [margin]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from revo_tpu.config import SystemConfig


def analytic_counts(cfg, solver="gn_fixed"):
    pyr = cfg.pyramid
    opt = cfg.tracker.optimizer
    caps = list(pyr.edge_capacity)
    lvls = list(range(pyr.pyr_max_lvl, pyr.pyr_min_lvl + 1))
    rows = []
    total_idx = 0
    total_bytes = 0
    # Row size of the solver's gathered quad row (dt4bf default: (H*W, 4)
    # bf16 = 8 B; dt4 f32 = 16 B; flat 12 f32 = 48 B).
    qf = getattr(opt, "quad_form", "dt4bf")
    row_bytes = {"dt4bf": 8, "dt4": 16, "flatbf": 24, "flat": 48,
                 "hw12": 48, "flat16": 64}.get(qf, 8)
    for lvl in lvls:
        evals = (
            opt.fixed_iters[lvl]
            if solver == "gn_fixed"
            else opt.max_its_per_lvl[lvl]  # upper bound for lm
        )
        idx = evals * caps[lvl]
        rows.append((f"solver L{lvl} ({evals} evals x {caps[lvl]})", idx,
                     idx * row_bytes))
        total_idx += idx
        total_bytes += idx * row_bytes
    if cfg.tracker.check_init_values:
        lvl = pyr.pyr_min_lvl
        idx = 2 * caps[lvl]  # eval_cost(identity) + eval_cost(init)
        rows.append((f"init check (2 evals x {caps[lvl]})", idx, idx * 4))
        total_idx += idx
        total_bytes += idx * 4
    # Frame build: the rank compaction's final fused (offset, z) row take
    # gathers one row per capacity lane per level.
    idx = sum(caps)
    rows.append((f"compaction row take ({'+'.join(map(str, caps))})", idx,
                 idx * 8))
    total_idx += idx
    total_bytes += idx * 8
    return rows, total_idx, total_bytes


def main():
    margin = float(sys.argv[1]) if len(sys.argv) > 1 else 1.10
    cfg = SystemConfig()
    if margin > 0:
        from revo_tpu.autotune import calibrate_capacities
        from revo_tpu.io.synthetic import SyntheticScene, render_sequence

        frames = list(
            render_sequence(SyntheticScene(), cfg.camera, 2, seed=0)
        )
        cfg = calibrate_capacities(
            cfg, [f[0] for f in frames], [f[1] for f in frames],
            margin=margin,
        )
    for solver in ("gn_fixed", "lm"):
        rows, idx, byts = analytic_counts(cfg, solver)
        print(f"\n== {solver}, margin={margin}, caps={cfg.pyramid.edge_capacity}")
        for name, i, b in rows:
            print(f"  {name:46s} {i:9d} idx  {b / 1e3:9.1f} kB")
        print(f"  {'TOTAL per sequence-step':46s} {idx:9d} idx  "
              f"{byts / 1e6:9.2f} MB")
        for ns in (4.0, 7.0):
            print(f"  @ {ns:.0f} ns/idx emitter floor: {idx * ns / 1e6:6.2f} "
                  f"ms/seq-step ({idx * ns * 8 / 1e6:6.2f} ms at B=8)")


if __name__ == "__main__":
    main()
