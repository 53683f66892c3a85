"""ATE-parity gate between the reference LM schedule and the fixed-iteration
GN fast path (SURVEY.md §7: 'branchless equivalents must be shown
ATE-neutral')."""
import dataclasses

import numpy as np
import pytest

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


@pytest.mark.slow  # batched A/B-form parity (the default form is gated fast)
class TestLaneSelect:
    def test_flat_matches_onehot_batched(self):
        """lane_select="flat" (lane folded into the gather index, (H*W*B,4)
        table) must produce bit-identical poses to the "onehot" wide-row
        select under the batched fold-hoisted solve — both fetch exactly
        the same stored components, only the gather shape differs."""
        import jax.numpy as jnp

        from revo_tpu.parallel.batch import vo_scan_batched

        def with_lane(cfg, form):
            return dataclasses.replace(
                cfg,
                tracker=dataclasses.replace(
                    cfg.tracker,
                    optimizer=dataclasses.replace(
                        cfg.tracker.optimizer, lane_select=form
                    ),
                ),
            )

        from test_batch import _render_stack

        cfg = _with_solver(small_cfg(), "gn_fixed")
        g0, d0, gt0 = _render_stack(cfg, 8, seed=0)
        g1, d1, gt1 = _render_stack(cfg, 8, seed=5)
        grays = jnp.stack([g0, g1])
        depths = jnp.stack([d0, d1])
        poses_oh = np.asarray(
            vo_scan_batched(grays, depths, with_lane(cfg, "onehot"))
        )
        poses_fl = np.asarray(
            vo_scan_batched(grays, depths, with_lane(cfg, "flat"))
        )
        np.testing.assert_array_equal(poses_oh, poses_fl)
        # And both track: sub-cm on each sequence.
        for b, gt in enumerate([gt0, gt1]):
            ate = absolute_trajectory_error(poses_fl[b], gt).rmse
            assert ate < 0.02, f"seq {b}: ATE {ate * 100:.2f} cm"


class TestBucketedTracking:
    def test_bucketed_bit_identical(self):
        """Per-frame capacity bucketing (tracker.track_frames_bucketed)
        slices only invalid padding lanes off the front-packed clouds;
        the result matches full-capacity tracking to reduction-order
        rounding (the padded lanes are exact zeros, but XLA's reduction
        tree shape depends on the lane count)."""
        import jax.numpy as jnp

        from revo_tpu import tracker
        from revo_tpu.frontend import build_frame, make_keyframe
        from revo_tpu.io.synthetic import SyntheticScene, render_sequence

        cfg = small_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 3, seed=6))
        f0 = build_frame(
            jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]), cfg
        )
        kf = make_keyframe(f0, jnp.eye(4), cfg)
        R, t = jnp.eye(3), jnp.zeros(3)
        for g, d, T, ts in frames[1:]:
            f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
            full = tracker.track_frames(kf, f, R, t, cfg)
            buck = tracker.track_frames_bucketed(kf, f, R, t, cfg)
            np.testing.assert_allclose(
                np.asarray(full.R), np.asarray(buck.R), atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(full.t), np.asarray(buck.t), atol=2e-5
            )
            assert abs(float(full.error) - float(buck.error)) < 1e-3
            assert int(full.good) == int(buck.good)
            R, t = full.R, full.t

    def test_bucket_selection(self):
        from revo_tpu.tracker import pick_buckets

        # fill 0.55 -> ratio 0.625 bucket, quantized up to 256 multiples
        assert pick_buckets([5632], [10240]) == (6400,)
        # overflow -> full capacity
        assert pick_buckets([11000], [10240]) == (10240,)
        # tiny capacities respect the quantum floor
        assert pick_buckets([10], [512]) == (256,)
