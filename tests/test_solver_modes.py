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

    def test_dt4_surface_gradient_ate_parity(self):
        """dt-only quad table (quad_form="dt4bf"): residuals bit-identical,
        Jacobian gradients from the bilinear dt surface instead of the
        interpolated central differences — the trajectory must stay at
        parity (the gathered row shrinks 24 -> 8 bytes)."""
        from revo_tpu.io.synthetic import SyntheticScene

        def with_form(cfg, form):
            return dataclasses.replace(
                cfg,
                tracker=dataclasses.replace(
                    cfg.tracker,
                    optimizer=dataclasses.replace(
                        cfg.tracker.optimizer, quad_form=form
                    ),
                ),
            )

        cfg12 = _with_solver(small_cfg(), "gn_fixed")
        cfg4 = with_form(cfg12, "dt4bf")
        poses12, gt, _, _ = run_vo(cfg12, 25, seed=4)
        poses4, gt2, _, _ = run_vo(cfg4, 25, seed=4)
        ate12 = absolute_trajectory_error(poses12, gt).rmse
        ate4 = absolute_trajectory_error(poses4, gt2).rmse
        assert ate4 < max(ate12 * 1.5, 0.005), (
            f"dt4bf {ate4 * 100:.2f} cm vs flatbf {ate12 * 100:.2f} cm"
        )
        # Depth-holes suite (the case that killed the penalized-mean init
        # metric, solver.eval_cost docstring).
        ph12, gth, _, _ = run_vo(
            cfg12, 15, seed=6, scene=SyntheticScene(depth_hole_frac=0.15)
        )
        ph4, gth2, _, _ = run_vo(
            cfg4, 15, seed=6, scene=SyntheticScene(depth_hole_frac=0.15)
        )
        ah12 = absolute_trajectory_error(ph12, gth).rmse
        ah4 = absolute_trajectory_error(ph4, gth2).rmse
        assert ah4 < max(ah12 * 1.5, 0.01), (
            f"holes: dt4bf {ah4 * 100:.2f} cm vs flatbf {ah12 * 100:.2f} cm"
        )

    def test_gn_fixed_with_holes(self):
        from revo_tpu.io.synthetic import SyntheticScene

        cfg = _with_solver(small_cfg(), "gn_fixed")
        poses, gt, report, _ = run_vo(
            cfg, 15, seed=6, scene=SyntheticScene(depth_hole_frac=0.15)
        )
        ate = absolute_trajectory_error(poses, gt).rmse
        assert ate < 0.03, f"ATE {ate * 100:.2f} cm"
