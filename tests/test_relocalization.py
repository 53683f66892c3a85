"""Relocalization tests — the recovery path the reference never implemented
(tracker.h:62-65 TRACKER_STATE_LOST dead-ends there)."""
import dataclasses

import numpy as np

from revo_tpu.io.synthetic import SyntheticScene, render_frame, render_sequence
from revo_tpu.system import VOSystem

from test_solver import small_cfg


class TestRelocalization:
    def test_teleport_recovers_via_keyframe_ring(self):
        """After a camera 'teleport' back to the first keyframe's view with a
        stale motion prior, relocalization must snap to the old keyframe."""
        cfg = small_cfg()
        scene = SyntheticScene()
        vo = VOSystem(cfg)
        poses = []
        frames = list(render_sequence(scene, cfg.camera, 10, seed=11))
        for gray, depth, T, ts in frames:
            poses.append(vo.process_frame(gray, depth, ts))

        # Teleport: next frame is rendered at a pose FAR from the current
        # one but identical to frame 0's view.
        g0, d0 = render_frame(scene, cfg.camera, frames[0][2])
        # poison the motion prior so plain tracking from it fails
        vo.T_nm1_n = np.eye(4, dtype=np.float32)
        vo.T_nm1_n[:3, 3] = [1.5, 1.0, -0.8]
        import jax.numpy as jnp

        vo.R = jnp.asarray(vo.T_nm1_n[:3, :3])
        vo.t = jnp.asarray(vo.T_nm1_n[:3, 3])
        pose = vo.process_frame(g0, d0, 99.0)
        err = np.linalg.norm(pose[:3, 3] - frames[0][2][:3, 3])
        assert err < 0.02, f"teleport pose error {err:.3f} m"
        assert vo.n_tracking_lost == 0

    def test_unrecoverable_marks_lost_and_propagates(self):
        """A garbage frame (no structure) marks LOST and coasts on the
        constant-velocity prior instead of corrupting the trajectory."""
        cfg = small_cfg()
        scene = SyntheticScene()
        vo = VOSystem(cfg)
        for gray, depth, T, ts in render_sequence(scene, cfg.camera, 6, seed=12):
            last = vo.process_frame(gray, depth, ts)
        flat = np.full(
            (cfg.camera.height, cfg.camera.width), 128.0, np.float32
        )
        nodepth = np.zeros_like(flat)
        pose = vo.process_frame(flat, nodepth, 99.0)
        assert vo.n_tracking_lost == 1
        # coasting: pose = last @ T_nm1_n, finite and close to last
        assert np.isfinite(pose).all()
        assert np.linalg.norm(pose[:3, 3] - last[:3, 3]) < 0.05

    def test_disabled_reloc_keeps_reference_behavior(self):
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg,
            tracker=dataclasses.replace(
                cfg.tracker, enable_relocalization=False
            ),
        )
        scene = SyntheticScene()
        vo = VOSystem(cfg)
        for gray, depth, T, ts in render_sequence(scene, cfg.camera, 5, seed=13):
            vo.process_frame(gray, depth, ts)
        assert vo.n_tracking_lost == 0
        assert len(vo.kf_history) >= 1


class TestJumpGate:
    def test_tight_gate_coasts_not_crashes(self):
        """With an absurdly tight jump gate every frame is flagged; the
        system must fall back to relocalization/coasting and survive the
        sequence (exercises the gate path end-to-end)."""
        import dataclasses

        import numpy as np

        from revo_tpu.eval import absolute_trajectory_error
        from test_solver import small_cfg
        from test_system import run_vo

        cfg = dataclasses.replace(
            small_cfg(),
            tracker=dataclasses.replace(
                small_cfg().tracker, max_jump_translation=1e-6,
                max_jump_rotation=1e-6,
            ),
        )
        poses, gt, report, _ = run_vo(cfg, 10, seed=4)
        assert len(poses) == 10
        assert np.isfinite(poses).all()

    def test_default_gate_never_fires_on_clean_run(self):
        from test_solver import small_cfg
        from test_system import run_vo

        poses, gt, report, _ = run_vo(small_cfg(), 15, seed=4)
        assert report.tracking_lost == 0


class TestScanRelocalization:
    """The device-resident scan twin's ring-reloc branch (parallel/batch.py
    with TrackerConfig.scan_relocalization): the whole recovery path — lost
    detection, vmapped ring candidate search, re-anchoring — runs inside
    lax.scan with zero host round trips."""

    def _reloc_cfg(self):
        cfg = small_cfg()
        # Tighten the jump gate so an in-sequence teleport (a few cm on the
        # synthetic scene) is flagged while normal ~0.8 cm/frame motion is
        # not.
        return dataclasses.replace(
            cfg,
            tracker=dataclasses.replace(
                cfg.tracker,
                scan_relocalization=True,
                max_jump_translation=0.04,
            ),
        )

    def test_scan_teleport_recovers_via_ring(self):
        import jax.numpy as jnp

        from revo_tpu.parallel.batch import vo_scan

        cfg = self._reloc_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 12, seed=11))
        grays = [f[0] for f in frames]
        depths = [f[1] for f in frames]
        # Teleport: jump back to frame 0's view mid-sequence, then stay.
        g0, d0 = render_frame(scene, cfg.camera, frames[0][2])
        grays += [g0, g0]
        depths += [d0, d0]
        poses, outs, _ = vo_scan(
            jnp.asarray(np.stack(grays)), jnp.asarray(np.stack(depths)), cfg
        )
        poses = np.asarray(poses)
        assert bool(np.asarray(outs.relocalized)[12]), "teleport frame must relocalize"
        err = np.linalg.norm(poses[12, :3, 3] - frames[0][2][:3, 3])
        assert err < 0.02, f"teleport pose error {err:.3f} m"
        # the sequence continues tracking after re-anchoring
        assert np.isfinite(poses).all()

    def test_scan_matches_host_loop_on_teleport(self):
        """Scan twin and host loop take the same recovery decisions on the
        same teleport sequence (reloc fires at the same frame, poses agree)."""
        import jax.numpy as jnp

        from revo_tpu.parallel.batch import vo_scan

        cfg = self._reloc_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 10, seed=7))
        g0, d0 = render_frame(scene, cfg.camera, frames[0][2])
        grays = [f[0] for f in frames] + [g0]
        depths = [f[1] for f in frames] + [d0]

        vo = VOSystem(cfg)
        host_poses = [
            vo.process_frame(g, d, i / 30.0)
            for i, (g, d) in enumerate(zip(grays, depths))
        ]
        scan_poses, outs, _ = vo_scan(
            jnp.asarray(np.stack(grays)), jnp.asarray(np.stack(depths)), cfg
        )
        diff = np.abs(np.asarray(scan_poses) - np.stack(host_poses)).max()
        assert diff < 5e-3, f"scan vs host pose diff {diff:.4f}"

    def test_scan_unrecoverable_coasts(self):
        """A garbage frame fails ring relocalization and coasts on the
        constant-velocity prior inside the scan."""
        import jax.numpy as jnp

        from revo_tpu.parallel.batch import vo_scan

        cfg = self._reloc_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 6, seed=12))
        flat = np.full((cfg.camera.height, cfg.camera.width), 128.0, np.float32)
        nodepth = np.zeros_like(flat)
        grays = [f[0] for f in frames] + [flat]
        depths = [f[1] for f in frames] + [nodepth]
        poses, outs, _ = vo_scan(
            jnp.asarray(np.stack(grays)), jnp.asarray(np.stack(depths)), cfg
        )
        poses = np.asarray(poses)
        assert bool(np.asarray(outs.lost)[6])
        assert not bool(np.asarray(outs.relocalized)[6])
        assert np.isfinite(poses).all()
        # coasting: last pose = prev pose advanced by the motion prior
        assert np.linalg.norm(poses[6, :3, 3] - poses[5, :3, 3]) < 0.05
