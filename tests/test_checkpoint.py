"""Checkpoint/resume: a run interrupted mid-sequence and resumed must match
the uninterrupted run (modulo the promotion-of-checkpoint-frame edge case)."""
import os

import numpy as np

from revo_tpu import checkpoint
from revo_tpu.io.synthetic import SyntheticScene, render_sequence
from revo_tpu.system import VOSystem

from test_solver import small_cfg


def _frames(cfg, n, seed=0):
    return [
        (g, d, ts)
        for g, d, T, ts in render_sequence(
            SyntheticScene(), cfg.camera, n, seed=seed
        )
    ]


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = small_cfg()
        frames = _frames(cfg, 8)
        vo = VOSystem(cfg)
        for g, d, ts in frames:
            vo.process_frame(g, d, ts)
        ckpt = checkpoint.capture(vo)
        path = os.path.join(tmp_path, "vo.npz")
        checkpoint.save(path, ckpt)
        loaded = checkpoint.load(path)
        np.testing.assert_allclose(loaded.T_w_kf, ckpt.T_w_kf)
        np.testing.assert_allclose(loaded.kf_structs[0], ckpt.kf_structs[0])
        assert loaded.n_frames == 8
        assert loaded.past_n == ckpt.past_n

    def test_resume_matches_continuous(self, tmp_path):
        cfg = small_cfg()
        frames = _frames(cfg, 14, seed=2)

        # Continuous run.
        vo_full = VOSystem(cfg)
        poses_full = [
            vo_full.process_frame(g, d, ts) for g, d, ts in frames
        ]

        # Interrupted at frame 7, checkpointed, resumed in a new system.
        vo_a = VOSystem(cfg)
        for g, d, ts in frames[:7]:
            vo_a.process_frame(g, d, ts)
        path = os.path.join(tmp_path, "vo.npz")
        checkpoint.save(path, checkpoint.capture(vo_a))

        vo_b = VOSystem(cfg)
        checkpoint.restore(vo_b, checkpoint.load(path), vo_a.prev_frame)
        poses_resumed = [
            vo_b.process_frame(g, d, ts) for g, d, ts in frames[7:]
        ]

        for p_full, p_res in zip(poses_full[7:], poses_resumed):
            np.testing.assert_allclose(p_res, p_full, atol=1e-5)


class TestScanCheckpoint:
    def test_scan_resume_equals_continuous(self, tmp_path):
        """Device-resident path: save the scan state mid-sequence, restore
        it through the npz round trip, continue — poses must match the
        continuous scan bit-for-bit (same program, same state)."""
        import jax.numpy as jnp
        import numpy as np

        from revo_tpu.checkpoint import load_scan_state, save_scan_state
        from revo_tpu.io.synthetic import SyntheticScene, render_sequence
        from revo_tpu.parallel.batch import vo_scan, vo_scan_from_state

        from test_solver import small_cfg

        cfg = small_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 10, seed=6))
        grays = jnp.asarray(np.stack([f[0] for f in frames]))
        depths = jnp.asarray(np.stack([f[1] for f in frames]))

        poses_full, _, _ = vo_scan(grays, depths, cfg)

        _, _, state_mid = vo_scan(grays[:6], depths[:6], cfg)
        path = str(tmp_path / "scan_state.npz")
        save_scan_state(path, state_mid)
        state_restored = load_scan_state(path, cfg)
        poses_tail, _, _ = vo_scan_from_state(
            state_restored, grays[6:], depths[6:], cfg
        )
        np.testing.assert_allclose(
            np.asarray(poses_tail),
            np.asarray(poses_full)[6:],
            atol=1e-6,
        )

    def test_config_mismatch_rejected(self, tmp_path):
        import dataclasses

        import jax.numpy as jnp
        import numpy as np
        import pytest

        from revo_tpu.checkpoint import load_scan_state, save_scan_state
        from revo_tpu.io.synthetic import SyntheticScene, render_sequence
        from revo_tpu.parallel.batch import vo_scan

        from test_solver import small_cfg

        cfg = small_cfg()
        scene = SyntheticScene()
        frames = list(render_sequence(scene, cfg.camera, 3, seed=6))
        grays = jnp.asarray(np.stack([f[0] for f in frames]))
        depths = jnp.asarray(np.stack([f[1] for f in frames]))
        _, _, state = vo_scan(grays, depths, cfg)
        path = str(tmp_path / "scan_state.npz")
        save_scan_state(path, state)

        bad = dataclasses.replace(
            cfg,
            pyramid=dataclasses.replace(
                cfg.pyramid, edge_capacity=(2048, 1024, 512)
            ),
        )
        with pytest.raises((KeyError, ValueError)):
            load_scan_state(path, bad)
