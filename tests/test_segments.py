"""Tests for segment-parallel tracking + stitching and PLY export."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from revo_tpu.eval import absolute_trajectory_error
from revo_tpu.parallel.batch import vo_scan
from revo_tpu.parallel.segments import (
    split_segments,
    stitch_segments,
    track_long_sequence,
)

from test_batch import _render_stack
from test_solver import small_cfg


class TestSegments:
    def test_split_overlap(self):
        g = jnp.arange(9.0)[:, None, None] * jnp.ones((1, 4, 4))
        d = g + 100
        sg, sd = split_segments(g, d, 4)
        assert sg.shape == (4, 3, 4, 4)
        # overlap: seg s last frame == seg s+1 first frame
        np.testing.assert_allclose(sg[0, -1], sg[1, 0])
        np.testing.assert_allclose(sg[2, -1], sg[3, 0])

    def test_stitch_identity_consistency(self):
        """Stitching exact segment-local ground truth reproduces the global
        trajectory."""
        rng = np.random.default_rng(0)
        from revo_tpu import lie

        n, s = 13, 4
        xs = rng.normal(size=(n - 1, 6)).astype(np.float32) * 0.05
        glob = [np.eye(4, dtype=np.float32)]
        for xi in xs:
            dR, dt = lie.exp_se3(jnp.asarray(xi))
            glob.append(glob[-1] @ np.asarray(lie.matrix_from_rt(dR, dt)))
        glob = np.stack(glob)
        step = (n - 1) // s
        seg_local = np.stack(
            [
                np.linalg.inv(glob[k * step])[None] @ glob[k * step:k * step + step + 1]
                for k in range(s)
            ]
        )
        stitched = np.asarray(stitch_segments(jnp.asarray(seg_local)))
        assert stitched.shape == (n, 4, 4)
        np.testing.assert_allclose(stitched, glob, atol=1e-4)

    def test_segment_parallel_ate(self):
        """4-way segment-parallel VO on a 25-frame clip stays accurate."""
        cfg = small_cfg()
        grays, depths, gt = _render_stack(cfg, 25)
        poses = np.asarray(track_long_sequence(grays, depths, cfg, 4))
        assert poses.shape == (25, 4, 4)
        ate = absolute_trajectory_error(poses, gt)
        assert ate.rmse < 0.03, f"ATE {ate.rmse * 100:.2f} cm"

    def test_matches_serial_roughly(self):
        cfg = small_cfg()
        grays, depths, gt = _render_stack(cfg, 13, seed=2)
        serial, _, _ = vo_scan(grays, depths, cfg)
        parallel = track_long_sequence(grays, depths, cfg, 4)
        # Same kernels, different keyframe schedules per segment: each
        # segment restarts its keyframe at the boundary, so anchors compose
        # each boundary's single-frame error (the wall-clock/accuracy
        # tradeoff of segment parallelism; refine=True exists to shrink it).
        d = np.linalg.inv(np.asarray(serial[-1])) @ np.asarray(parallel[-1])
        assert np.linalg.norm(d[:3, 3]) < 0.02

    def test_sharded_segments(self):
        cfg = small_cfg()
        grays, depths, gt = _render_stack(cfg, 17, seed=3)
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
        poses = np.asarray(
            track_long_sequence(grays, depths, cfg, 8, mesh=mesh)
        )
        ate = absolute_trajectory_error(poses, gt)
        assert ate.rmse < 0.03, f"ATE {ate.rmse * 100:.2f} cm"


class TestPLYExport:
    def test_export_files(self, tmp_path):
        from revo_tpu.frontend import build_frame, generate_colored_pcl
        from revo_tpu.io.synthetic import SyntheticScene, render_frame
        from revo_tpu.viz import (
            export_colored_pcl_ply,
            export_keyframe_frusta_ply,
            export_trajectory_ply,
        )

        cfg = small_cfg()
        g, d = render_frame(SyntheticScene(), cfg.camera, np.eye(4, dtype=np.float32))
        f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
        pts, clr = generate_colored_pcl(f, cfg, lvl=0, dense=False)
        assert len(pts) > 100 and pts.shape[1] == 3

        pcl_path = os.path.join(tmp_path, "pcl.ply")
        export_colored_pcl_ply(pcl_path, pts, clr)
        head = open(pcl_path).read().splitlines()
        assert head[0] == "ply"
        assert f"element vertex {len(pts)}" in head[2]

        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[1, 0, 3] = 0.5
        poses[2, 0, 3] = 1.0
        kf_path = os.path.join(tmp_path, "kf.ply")
        export_keyframe_frusta_ply(kf_path, list(poses))
        content = open(kf_path).read()
        assert "element vertex 15" in content
        assert "element edge 26" in content

        traj_path = os.path.join(tmp_path, "traj.ply")
        export_trajectory_ply(traj_path, poses)
        assert "element edge 2" in open(traj_path).read()


class TestPlots:
    def test_plot_files_written(self, tmp_path):
        from revo_tpu.viz import plot_error, plot_trajectory

        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(4, dtype=np.float64), (10, 1, 1))
        poses[:, :3, 3] = np.cumsum(rng.normal(size=(10, 3)) * 0.01, axis=0)
        gt = poses.copy()
        gt[:, :3, 3] += rng.normal(size=(10, 3)) * 0.002
        p1 = os.path.join(tmp_path, "traj.png")
        p2 = os.path.join(tmp_path, "err.png")
        plot_trajectory(p1, poses, gt)
        plot_error(p2, poses, gt)
        assert os.path.getsize(p1) > 5000
        assert os.path.getsize(p2) > 5000


class TestDebugOverlay:
    def test_reprojection_overlay(self, tmp_path):
        """The DO_SHOW_DEBUG_IMAGE equivalent: warped edge points splat
        onto the keyframe gray, colored by DT residual; near-identity
        tracking must land mostly green (low residual)."""
        import jax.numpy as jnp
        import numpy as np

        from revo_tpu.frontend import build_frame, make_keyframe
        from revo_tpu.io.synthetic import SyntheticScene, render_frame
        from revo_tpu.viz import reprojection_overlay
        from test_solver import small_cfg

        cfg = small_cfg()
        scene = SyntheticScene()
        g, d = render_frame(scene, cfg.camera, np.eye(4, dtype=np.float32))
        f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
        kf = make_keyframe(f, jnp.eye(4), cfg)
        png = str(tmp_path / "overlay.png")
        img = reprojection_overlay(
            kf, f, np.eye(3), np.zeros(3), cfg, out_png=png
        )
        assert img.shape == (cfg.camera.height, cfg.camera.width, 3)
        # Identity warp of the same frame lands exactly on edges: the
        # drawn pixels must be dominantly green (residual ~0).
        drawn = img[..., 2] == 0
        drawn &= img[..., 1] > 0
        assert drawn.sum() > 100
        assert (img[drawn][:, 1] > 200).mean() > 0.9
        import os

        assert os.path.exists(png)
