"""Stage-parallel replay (parallel.pipeline): the two-device build/solve
pipeline must produce the same trajectory as the single-device step."""
import numpy as np
import jax
import jax.numpy as jnp

from revo_tpu import tracker
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_sequence
from revo_tpu.parallel.pipeline import pipeline_replay
from test_solver import small_cfg


class TestPipelineReplay:
    def test_matches_single_device(self):
        cfg = small_cfg()
        frames = list(
            render_sequence(SyntheticScene(), cfg.camera, 6, seed=5)
        )
        grays = [f[0] for f in frames]
        depths = [f[1] for f in frames]

        assert len(jax.devices()) >= 2  # conftest: 8 virtual CPU devices
        poses_p, errs_p = pipeline_replay(grays, depths, cfg)

        # Sequential single-device reference: same kernels, same order.
        kf = make_keyframe(
            build_frame(jnp.asarray(grays[0]), jnp.asarray(depths[0]), cfg),
            jnp.eye(4),
            cfg,
        )
        R, t = jnp.eye(3), jnp.zeros(3)
        poses_s = [np.eye(4, dtype=np.float32)]
        for g, d in zip(grays[1:], depths[1:]):
            f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
            res = tracker.track_frames(kf, f, R, t, cfg)
            R, t = res.R, res.t
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray(R)
            T[:3, 3] = np.asarray(t)
            poses_s.append(T)

        np.testing.assert_allclose(
            np.asarray(poses_p), np.stack(poses_s), atol=1e-6
        )
        # And it actually tracked (non-trivial motion, low DT error).
        assert float(np.abs(np.asarray(poses_p)[1:, :3, 3]).max()) > 1e-4
        assert float(np.asarray(errs_p)[1:].max()) < 5.0
