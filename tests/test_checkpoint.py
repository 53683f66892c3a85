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
