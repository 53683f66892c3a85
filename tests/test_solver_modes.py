"""ATE-parity gate between the reference LM schedule and the fixed-iteration
GN fast path (SURVEY.md §7: 'branchless equivalents must be shown
ATE-neutral')."""
import dataclasses

import numpy as np

from revo_tpu.eval import absolute_trajectory_error
from test_solver import small_cfg
from test_system import run_vo


def _with_solver(cfg, solver):
    return dataclasses.replace(
        cfg,
        tracker=dataclasses.replace(
            cfg.tracker,
            optimizer=dataclasses.replace(cfg.tracker.optimizer, solver=solver),
        ),
    )


class TestSolverModeParity:
    def test_gn_fixed_matches_lm_ate(self):
        cfg_lm = _with_solver(small_cfg(), "lm")
        cfg_gn = _with_solver(small_cfg(), "gn_fixed")

        poses_lm, gt, _, _ = run_vo(cfg_lm, 25, seed=4)
        poses_gn, gt2, _, _ = run_vo(cfg_gn, 25, seed=4)

        ate_lm = absolute_trajectory_error(poses_lm, gt).rmse
        ate_gn = absolute_trajectory_error(poses_gn, gt2).rmse
        # Both must be accurate; the fast path may not be worse than the
        # reference schedule by more than 50% (both are sub-cm here).
        assert ate_lm < 0.02, f"LM ATE {ate_lm * 100:.2f} cm"
        assert ate_gn < 0.02, f"GN ATE {ate_gn * 100:.2f} cm"
        assert ate_gn < max(ate_lm * 1.5, 0.005), (
            f"GN {ate_gn * 100:.2f} cm vs LM {ate_lm * 100:.2f} cm"
        )

    def test_gn_fixed_with_holes(self):
        from revo_tpu.io.synthetic import SyntheticScene

        cfg = _with_solver(small_cfg(), "gn_fixed")
        poses, gt, report, _ = run_vo(
            cfg, 15, seed=6, scene=SyntheticScene(depth_hole_frac=0.15)
        )
        ate = absolute_trajectory_error(poses, gt).rmse
        assert ate < 0.03, f"ATE {ate * 100:.2f} cm"
