"""Tests for windowed multi-frame joint optimization (the capability the
reference stubbed out)."""
import jax
import jax.numpy as jnp
import numpy as np

from revo_tpu import lie, ops
from revo_tpu.config import OptimizerConfig
from revo_tpu.parallel.windowed import (
    Window,
    make_pairs,
    make_pairs_overlap,
    measure_overlap,
    optimize_window,
    optimize_window_sharded,
)

from test_solver import CAM, _wireframe_points, _rasterize_edges


def _build_window(n_frames=4, perturb=0.0, seed=0):
    """Frames all observing the same wireframe from slightly different true
    poses; initial poses optionally perturbed."""
    rng = np.random.default_rng(seed)
    pts_world = _wireframe_points()
    true_poses = [np.eye(4, dtype=np.float32)]
    for k in range(1, n_frames):
        xi = rng.normal(size=6).astype(np.float32) * 0.02
        dR, dt = lie.exp_se3(jnp.asarray(xi))
        true_poses.append(
            true_poses[-1] @ np.asarray(lie.matrix_from_rt(dR, dt))
        )
    structs, points, valid = [], [], []
    P = 1024
    for T in true_poses:
        Tinv = np.linalg.inv(T)
        pts_cam = pts_world @ Tinv[:3, :3].T + Tinv[:3, 3]
        edges = _rasterize_edges(pts_cam, CAM)
        structs.append(np.asarray(ops.keyframe_structure(jnp.asarray(edges))))
        p = np.zeros((P, 3), np.float32)
        n = min(len(pts_cam), P)
        p[:n] = pts_cam[:n]
        v = np.zeros(P, bool)
        v[:n] = True
        points.append(p)
        valid.append(v)

    init = np.stack(true_poses).copy()
    if perturb > 0:
        for k in range(1, n_frames):
            xi = rng.normal(size=6).astype(np.float32) * perturb
            dR, dt = lie.exp_se3(jnp.asarray(xi))
            init[k] = np.asarray(lie.matrix_from_rt(dR, dt)) @ init[k]
    return (
        Window(
            structs=jnp.asarray(np.stack(structs)),
            points=jnp.asarray(np.stack(points)),
            valid=jnp.asarray(np.stack(valid)),
            poses=jnp.asarray(init),
        ),
        np.stack(true_poses),
    )


def _build_window_at(cam, true_poses, perturb=None, seed=0):
    """Like _build_window but rasterized for an arbitrary camera level and
    a GIVEN set of true poses (for multi-level pyramids)."""
    pts_world = _wireframe_points()
    structs, points, valid = [], [], []
    P = 1024
    for T in true_poses:
        Tinv = np.linalg.inv(T)
        pts_cam = pts_world @ Tinv[:3, :3].T + Tinv[:3, 3]
        edges = _rasterize_edges(pts_cam, cam)
        structs.append(np.asarray(ops.keyframe_structure(jnp.asarray(edges))))
        p = np.zeros((P, 3), np.float32)
        n = min(len(pts_cam), P)
        p[:n] = pts_cam[:n]
        v = np.zeros(P, bool)
        v[:n] = True
        points.append(p)
        valid.append(v)
    return (
        Window(
            structs=jnp.asarray(np.stack(structs)),
            points=jnp.asarray(np.stack(points)),
            valid=jnp.asarray(np.stack(valid)),
            poses=jnp.asarray(np.stack(true_poses)),
        ),
        np.stack(true_poses),
    )


def _numpy_window_system(structs, points, valid, poses, pi, pj, pw, opt):
    """Independent NumPy re-derivation of the windowed normal equations
    (same residual definition, float64 accumulation)."""

    def skew(t):
        return np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]],
            np.float64,
        )

    n_frames = poses.shape[0]
    H = np.zeros((n_frames, n_frames, 6, 6), np.float64)
    b = np.zeros((n_frames, 6), np.float64)
    err_total = 0.0
    huber = opt.huber_edge
    edge_dist = opt.edge_distance_lvl[0]
    h_img, w_img = structs.shape[1], structs.shape[2]
    fx, fy, cx, cy = CAM.fx, CAM.fy, CAM.cx, CAM.cy

    for i, j, pwk in zip(pi, pj, pw):
        T_rel = np.linalg.inv(poses[i].astype(np.float64)) @ poses[j]
        wxp = points[j] @ T_rel[:3, :3].T + T_rel[:3, 3]
        pz = np.where(wxp[:, 2] == 0, 1e-12, wxp[:, 2])
        u = wxp[:, 0] / pz * fx + cx
        v = wxp[:, 1] / pz * fy + cy
        inb = (u > 1) & (v > 1) & (u < w_img - 2) & (v < h_img - 2)
        inb &= valid[j]
        fx_, fy_ = np.floor(u), np.floor(v)
        dx, dy = u - fx_, v - fy_
        ix = np.clip(fx_.astype(int), 0, w_img - 2)
        iy = np.clip(fy_.astype(int), 0, h_img - 2)
        s = structs[i].reshape(-1, 3).astype(np.float64)
        base = iy * w_img + ix
        dxdy = (dx * dy)[:, None]
        samp = (
            dxdy * s[base + w_img + 1]
            + (dy[:, None] - dxdy) * s[base + w_img]
            + (dx[:, None] - dxdy) * s[base + 1]
            + (1 - dx[:, None] - dy[:, None] + dxdy) * s[base]
        )
        r = samp[:, 2]
        good = inb & (r <= edge_dist)
        gx = fx * samp[:, 0]
        gy = fy * samp[:, 1]
        r_safe = np.where(r == 0, 1.0, r)
        w = np.where(r <= huber, 1.0, huber / r_safe) * good
        iz = 1.0 / pz
        iz2 = iz * iz
        px, py = wxp[:, 0], wxp[:, 1]
        Jr = np.stack(
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
        n = max(good.sum(), 1)
        A_rel = (Jr * w[:, None]).T @ Jr / n
        g_rel = Jr.T @ (w * r) / n
        Ti_inv = np.linalg.inv(poses[i].astype(np.float64))
        R_, t_ = Ti_inv[:3, :3], Ti_inv[:3, 3]
        Ad = np.block([[R_, skew(t_) @ R_], [np.zeros((3, 3)), R_]])
        A_blk = Ad.T @ A_rel @ Ad * pwk
        g_blk = Ad.T @ g_rel * pwk
        err_total += (w * r * r).sum() / n * pwk
        H[j, j] += A_blk
        H[i, i] += A_blk
        H[i, j] -= A_blk
        H[j, i] -= A_blk
        b[j] += g_blk
        b[i] -= g_blk
    return (
        H.astype(np.float32),
        b.astype(np.float32),
        np.float32(err_total),
    )


def _pose_errors(got, want):
    errs = []
    for a, b in zip(got, want):
        d = np.linalg.inv(a) @ b
        errs.append(np.linalg.norm(d[:3, 3]))
    return np.array(errs)


class TestWindowed:
    def test_consistent_window_stays_put(self):
        win, true = _build_window(perturb=0.0)
        pi, pj, pw = make_pairs(4, radius=2)
        poses, err = optimize_window(
            win, pi, pj, pw, CAM, OptimizerConfig(), iters=10
        )
        errs = _pose_errors(np.asarray(poses), true)
        # floor: rasterized-edge quantization (~0.5 px) at 160x120
        assert errs.max() < 0.005, errs

    def test_recovers_perturbed_window(self):
        win, true = _build_window(perturb=0.01, seed=3)
        pi, pj, pw = make_pairs(4, radius=2)
        init_errs = _pose_errors(np.asarray(win.poses), true)
        poses, err = optimize_window(
            win, pi, pj, pw, CAM, OptimizerConfig(), iters=10
        )
        errs = _pose_errors(np.asarray(poses), true)
        assert errs.max() < init_errs.max() * 0.55, (init_errs, errs)
        assert errs.max() < 0.012

    def test_gauge_fixed(self):
        win, true = _build_window(perturb=0.01, seed=4)
        pi, pj, pw = make_pairs(4, radius=2)
        poses, _ = optimize_window(
            win, pi, pj, pw, CAM, OptimizerConfig(), iters=5
        )
        np.testing.assert_allclose(
            np.asarray(poses[0]), np.asarray(win.poses[0]), atol=1e-6
        )

    def test_numpy_oracle_system_parity(self):
        """The windowed normal equations (H, b, err) match an independent
        NumPy re-derivation of the same residuals (SURVEY.md §7 'hard
        parts': validate the all-new BA math against a CPU oracle built
        from the same residuals)."""
        from revo_tpu.parallel.windowed import _accumulate_pairs

        win, _ = _build_window(n_frames=3, perturb=0.01, seed=8)
        pi, pj, pw = make_pairs(3, radius=2)
        opt = OptimizerConfig()
        H, b, err = _accumulate_pairs(
            win, pi, pj, pw, CAM, opt, 0, 3
        )
        Ho, bo, erro = _numpy_window_system(
            np.asarray(win.structs),
            np.asarray(win.points),
            np.asarray(win.valid),
            np.asarray(win.poses),
            np.asarray(pi),
            np.asarray(pj),
            np.asarray(pw),
            opt,
        )
        np.testing.assert_allclose(np.asarray(H), Ho, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(b), bo, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(err), erro, rtol=2e-4)

    def test_lm_survives_divergent_start(self):
        """A start where raw GN (lambda=0 fixed steps) blows up: the
        accept/reject schedule must keep the windowed error non-increasing
        and end at least as good as the start."""
        import dataclasses

        from revo_tpu.parallel.windowed import (
            _accumulate_pairs,
            _window_step,
        )

        # Sparse constraints + no robust filtering + a big perturbation:
        # the ill-conditioned joint system makes raw GN oscillate.
        opt = dataclasses.replace(
            OptimizerConfig(), huber_edge=0.3, use_edge_filter=False
        )
        win, true = _build_window(n_frames=4, perturb=0.15, seed=21)
        vv = np.asarray(win.valid)
        keep = np.zeros_like(vv)
        keep[:, :24] = vv[:, :24]
        win = win._replace(valid=jnp.asarray(keep))
        pi, pj, pw = make_pairs(4, radius=3)

        def err_at(poses):
            _, _, e = _accumulate_pairs(
                win._replace(poses=poses), pi, pj, pw, CAM, opt, 0, 4
            )
            return float(e)

        e0 = err_at(win.poses)
        # Raw undamped GN from this start must degrade within a few steps
        # (that's what makes this a divergence case).
        poses = win.poses
        diverged = False
        for _ in range(6):
            H, b, _ = _accumulate_pairs(
                win._replace(poses=poses), pi, pj, pw, CAM, opt, 0, 4
            )
            poses, _ = _window_step(poses, H, b, 4, jnp.float32(0.0))
            if err_at(poses) > e0 * 1.05:
                diverged = True
                break
        assert diverged, "perturbation too mild to exercise the damping"

        opt_poses, e_final = optimize_window(
            win, pi, pj, pw, CAM, opt, iters=12, damping=1.0
        )
        assert float(e_final) <= e0 * 1.0001, (e0, float(e_final))
        assert np.isfinite(np.asarray(opt_poses)).all()

    def test_coarse_to_fine_pyramid(self):
        """Two-level coarse-to-fine windowed optimization: starting at the
        coarse level widens the pull-in basin — from the same start, the
        pyramid must beat BOTH the initial poses and a fine-level-only run
        with the same total iteration budget (the coarse-to-fine rationale
        of tracker.cpp:324-340 applied to the joint window)."""
        from revo_tpu.parallel.windowed import optimize_window_pyramid

        win0, true = _build_window(n_frames=4, perturb=0.02, seed=9)
        win1, _ = _build_window_at(CAM.level(1), true)
        win1 = win1._replace(poses=win0.poses)
        pi, pj, pw = make_pairs(4, radius=2)

        poses_c2f, _ = optimize_window_pyramid(
            (win0, win1),
            pi,
            pj,
            pw,
            (CAM, CAM.level(1)),
            OptimizerConfig(),
            iters_per_lvl=(8, 8),
        )
        poses_fine, _ = optimize_window(
            win0, pi, pj, pw, CAM, OptimizerConfig(), iters=16
        )
        errs_c2f = _pose_errors(np.asarray(poses_c2f), true)
        errs_fine = _pose_errors(np.asarray(poses_fine), true)
        init_errs = _pose_errors(np.asarray(win0.poses), true)
        assert errs_c2f.max() < init_errs.max(), (init_errs, errs_c2f)
        assert errs_c2f.max() < errs_fine.max(), (errs_fine, errs_c2f)
        # gauge still pinned
        np.testing.assert_allclose(
            np.asarray(poses_c2f[0]), np.asarray(win0.poses[0]), atol=1e-6
        )

    def test_refine_keyframes_from_real_keyframes(self):
        """refine_keyframes (the run.py --windowed-ba entry) builds its
        per-level windows straight from Keyframe objects and reduces
        perturbed keyframe pose error on rendered frames."""
        import dataclasses

        from revo_tpu import lie
        from revo_tpu.frontend import build_frame, make_keyframe
        from revo_tpu.io.synthetic import SyntheticScene, render_frame
        from revo_tpu.parallel.windowed import refine_keyframes
        from test_solver import small_cfg

        cfg = small_cfg()
        scene = SyntheticScene()
        rng = np.random.default_rng(3)
        true_poses = [np.eye(4, dtype=np.float32)]
        for _ in range(3):
            xi = rng.normal(size=6).astype(np.float32) * 0.02
            dR, dt = lie.exp_se3(jnp.asarray(xi))
            true_poses.append(
                true_poses[-1] @ np.asarray(lie.matrix_from_rt(dR, dt))
            )
        kfs = []
        for T in true_poses:
            g, d = render_frame(scene, cfg.camera, T)
            f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
            # perturb the stored world pose (drifted odometry estimate)
            xi = rng.normal(size=6).astype(np.float32) * 0.008
            dR, dt = lie.exp_se3(jnp.asarray(xi))
            T_pert = np.asarray(lie.matrix_from_rt(dR, dt)) @ T
            kfs.append(make_keyframe(f, jnp.asarray(T_pert), cfg))
        kfs[0] = kfs[0]._replace(T_w_k=jnp.asarray(true_poses[0]))  # gauge

        init_err = max(
            np.linalg.norm(np.asarray(k.T_w_k)[:3, 3] - T[:3, 3])
            for k, T in zip(kfs, true_poses)
        )
        refined = refine_keyframes(kfs, cfg)
        ref_err = max(
            np.linalg.norm(refined[i][:3, 3] - T[:3, 3])
            for i, T in enumerate(true_poses)
        )
        assert ref_err < init_err * 0.7, (init_err, ref_err)

    def test_sharded_matches_single(self):
        win, true = _build_window(n_frames=5, perturb=0.008, seed=5)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("pair",))
        poses_sh = np.asarray(
            optimize_window_sharded(
                win, CAM, OptimizerConfig(), mesh, iters=6, radius=2
            )
        )
        pi, pj, pw = make_pairs(5, radius=2)
        poses_1, _ = optimize_window(
            win, pi, pj, pw, CAM, OptimizerConfig(), iters=6
        )
        np.testing.assert_allclose(poses_sh, np.asarray(poses_1), atol=2e-4)


class TestOverlapPairs:
    """Overlap-derived co-visibility (VERDICT r2 item 7): pairs + weights
    from MEASURED view overlap instead of the fixed index ring."""

    def _revisit_window(self, drift=0.012, seed=2):
        """Out-and-back true trajectory of 6 frames: frame 5 revisits frame
        0's viewpoint (high overlap, far in index), with accumulated drift
        on the stored poses so the endpoint is the most wrong."""
        rng = np.random.default_rng(seed)
        xi = np.array([0.05, 0.012, 0.02, 0.004, 0.025, 0.0], np.float32)
        amps = [0.0, 1.0, 2.0, 2.2, 1.1, 0.08]
        true = []
        for a in amps:
            dR, dt = lie.exp_se3(jnp.asarray(a * xi))
            true.append(np.asarray(lie.matrix_from_rt(dR, dt)))
        win, true = _build_window_at(CAM, np.stack(true).astype(np.float32))
        init = np.asarray(win.poses).copy()
        for k in range(1, 6):
            dxi = rng.normal(size=6).astype(np.float32) * drift * k / 5.0
            dR, dt = lie.exp_se3(jnp.asarray(dxi))
            init[k] = np.asarray(lie.matrix_from_rt(dR, dt)) @ init[k]
        return win._replace(poses=jnp.asarray(init)), true

    def test_overlap_matrix_finds_revisit(self):
        win, true = self._revisit_window()
        O = np.asarray(measure_overlap(win, CAM, OptimizerConfig()))
        assert O.shape == (6, 6) and np.allclose(np.diag(O), 0.0)
        # The revisit pair overlaps strongly despite being index-distant.
        assert O[0, 5] > 0.5, O
        pi, pj, pw = make_pairs_overlap(win, CAM, OptimizerConfig())
        pairs = set(zip(np.asarray(pi).tolist(), np.asarray(pj).tolist()))
        assert (0, 5) in pairs and (5, 0) in pairs, sorted(pairs)

    def test_overlap_beats_ring_on_revisit(self):
        """The loop pair the +-1 ring cannot see anchors the drifted
        endpoint: overlap-paired BA must end at least as accurate as
        ring-paired BA, and strictly better on the revisit frame."""
        win, true = self._revisit_window()
        opt = OptimizerConfig()
        pi_r, pj_r, pw_r = make_pairs(6, radius=1)
        poses_ring, _ = optimize_window(win, pi_r, pj_r, pw_r, CAM, opt,
                                        iters=12)
        pi_o, pj_o, pw_o = make_pairs_overlap(win, CAM, opt)
        poses_ovl, _ = optimize_window(win, pi_o, pj_o, pw_o, CAM, opt,
                                       iters=12)
        err_ring = _pose_errors(np.asarray(poses_ring), true)
        err_ovl = _pose_errors(np.asarray(poses_ovl), true)
        assert err_ovl.max() <= err_ring.max() * 1.05, (err_ring, err_ovl)
        assert err_ovl[5] < err_ring[5], (err_ring[5], err_ovl[5])


class TestDampingCarryAndLoopEdges:
    """Round-3 refinements: lambda carried across pyramid levels, and
    verified loop-closure edges entering the joint refinement as residual
    pairs (refine_keyframes extra_pairs / run.py combined flags)."""

    def test_pyramid_carry_damping(self):
        """Carrying the coarse level's exit lambda into the finer levels
        (default) must not lose accuracy vs resetting lambda per level,
        and both must beat the initial poses."""
        from revo_tpu.parallel.windowed import optimize_window_pyramid

        win0, true = _build_window(n_frames=4, perturb=0.02, seed=9)
        win1, _ = _build_window_at(CAM.level(1), true)
        win1 = win1._replace(poses=win0.poses)
        pi, pj, pw = make_pairs(4, radius=2)
        args = ((win0, win1), pi, pj, pw, (CAM, CAM.level(1)),
                OptimizerConfig())
        p_carry, e_carry = optimize_window_pyramid(
            *args, iters_per_lvl=(8, 8), carry_damping=True
        )
        p_reset, e_reset = optimize_window_pyramid(
            *args, iters_per_lvl=(8, 8), carry_damping=False
        )
        init_errs = _pose_errors(np.asarray(win0.poses), true)
        errs_carry = _pose_errors(np.asarray(p_carry), true)
        errs_reset = _pose_errors(np.asarray(p_reset), true)
        assert np.isfinite(float(e_carry)) and np.isfinite(float(e_reset))
        assert errs_carry.max() < init_errs.max(), (init_errs, errs_carry)
        assert errs_carry.max() <= errs_reset.max() * 1.05, (
            errs_reset, errs_carry,
        )

    def test_refine_keyframes_loop_edge_pair(self):
        """A verified revisit entering refine_keyframes as an extra_pairs
        residual edge anchors the drifted endpoint: with a blind +-1 ring
        pairing, adding the (first, last) loop pair must end strictly more
        accurate on the revisit frame (the run.py --close-loops +
        --windowed-ba combination)."""
        from revo_tpu import lie
        from revo_tpu.frontend import build_frame, make_keyframe
        from revo_tpu.io.synthetic import SyntheticScene, render_frame
        from revo_tpu.parallel.windowed import refine_keyframes
        from test_solver import small_cfg

        cfg = small_cfg()
        scene = SyntheticScene()
        rng = np.random.default_rng(11)
        # Out-and-back: the last viewpoint revisits the first.
        xi = np.array([0.05, 0.012, 0.02, 0.004, 0.025, 0.0], np.float32)
        amps = [0.0, 1.0, 2.0, 2.2, 1.1, 0.05]
        true_poses = []
        for a in amps:
            dR, dt = lie.exp_se3(jnp.asarray(a * xi))
            true_poses.append(np.asarray(lie.matrix_from_rt(dR, dt)))
        kfs = []
        for k, T in enumerate(true_poses):
            g, d = render_frame(scene, cfg.camera, T)
            f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
            # Drift grows along the trajectory; the endpoint is most wrong.
            dxi = rng.normal(size=6).astype(np.float32) * 0.01 * k / 5.0
            dR, dt = lie.exp_se3(jnp.asarray(dxi))
            T_pert = np.asarray(lie.matrix_from_rt(dR, dt)) @ T
            kfs.append(make_keyframe(f, jnp.asarray(T_pert), cfg))
        kfs[0] = kfs[0]._replace(T_w_k=jnp.asarray(true_poses[0]))  # gauge

        def end_err(refined):
            return np.linalg.norm(refined[5][:3, 3] - true_poses[5][:3, 3])

        plain = refine_keyframes(kfs, cfg, pairs="ring", radius=1)
        looped = refine_keyframes(
            kfs, cfg, pairs="ring", radius=1, extra_pairs=[(0, 5, 2.0)]
        )
        assert end_err(looped) < end_err(plain), (
            end_err(plain), end_err(looped),
        )
