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
