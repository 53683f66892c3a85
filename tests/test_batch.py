"""Tests for scan-based sequence VO and multi-sequence batching.

The scan path must match the host-loop VOSystem (same kernels, same control
flow) and shard cleanly over the 8-virtual-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from revo_tpu.eval import absolute_trajectory_error
from revo_tpu.io.synthetic import SyntheticScene, render_sequence
from revo_tpu.parallel.batch import vo_scan, vo_scan_batched
from revo_tpu.system import VOSystem

from test_solver import small_cfg


def _render_stack(cfg, n, seed=0):
    gt, gs, ds = [], [], []
    for gray, depth, T, ts in render_sequence(
        SyntheticScene(), cfg.camera, n, seed=seed
    ):
        gs.append(gray)
        ds.append(depth)
        gt.append(T)
    return (
        jnp.asarray(np.stack(gs)),
        jnp.asarray(np.stack(ds)),
        np.stack(gt),
    )


class TestVOScan:
    def test_matches_host_loop(self):
        """Scan VO == host-loop VOSystem on the same sequence."""
        cfg = small_cfg()
        grays, depths, gt = _render_stack(cfg, 12)
        poses_scan, outs, _ = vo_scan(grays, depths, cfg)
        poses_scan = np.asarray(poses_scan)

        vo = VOSystem(cfg)
        frames = [
            (np.asarray(grays[i]), np.asarray(depths[i]), i / 30.0)
            for i in range(12)
        ]
        poses_host, _, _ = vo.run(iter(frames))
        np.testing.assert_allclose(poses_scan, poses_host, atol=5e-4)

    def test_accuracy_gate(self):
        cfg = small_cfg()
        grays, depths, gt = _render_stack(cfg, 25)
        poses, outs, state = vo_scan(grays, depths, cfg)
        ate = absolute_trajectory_error(np.asarray(poses), gt)
        assert ate.rmse < 0.02, f"ATE {ate.rmse * 100:.2f} cm"
        assert int(state.n_keyframes) >= 1

    def test_batched_vmap(self):
        cfg = small_cfg()
        g0, d0, gt0 = _render_stack(cfg, 8, seed=0)
        g1, d1, gt1 = _render_stack(cfg, 8, seed=5)
        grays = jnp.stack([g0, g1])
        depths = jnp.stack([d0, d1])
        poses = vo_scan_batched(grays, depths, cfg)
        assert poses.shape == (2, 8, 4, 4)
        for b, gt in enumerate([gt0, gt1]):
            ate = absolute_trajectory_error(np.asarray(poses[b]), gt)
            assert ate.rmse < 0.02, f"seq {b}: ATE {ate.rmse * 100:.2f} cm"

    @pytest.mark.slow  # 4-seed x 24-frame scan accuracy battery (~18 s)
    def test_multi_seed_accuracy_gate(self):
        """CI-light version of the 12-seed x 100-frame offline sweep
        (STATUS.md accuracy envelope): 8 random handheld trajectories x 40
        frames in ONE batched dispatch, every seed must stay sub-centimetre.
        Offline probe measured 0.14-0.47 cm across these seeds; gate at
        0.8 cm so a single-seed regression (e.g. an init-check or voting
        change that breaks one basin) trips it without flaking."""
        cfg = small_cfg()
        seqs = [_render_stack(cfg, 40, seed=s) for s in range(8)]
        grays = jnp.stack([s[0] for s in seqs])
        depths = jnp.stack([s[1] for s in seqs])
        poses = np.asarray(vo_scan_batched(grays, depths, cfg))
        ates = [
            absolute_trajectory_error(poses[b], seqs[b][2]).rmse
            for b in range(8)
        ]
        worst = max(ates)
        assert worst < 0.008, (
            f"worst seed ATE {worst * 100:.2f} cm "
            f"({['%.2f' % (a * 100) for a in ates]})"
        )

    def test_batched_shard_map_matches_vmap(self):
        cfg = small_cfg()
        seqs = [_render_stack(cfg, 6, seed=s) for s in range(8)]
        grays = jnp.stack([s[0] for s in seqs])
        depths = jnp.stack([s[1] for s in seqs])

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
        poses_sharded = np.asarray(
            vo_scan_batched(grays, depths, cfg, mesh=mesh)
        )
        poses_vmap = np.asarray(vo_scan_batched(grays, depths, cfg))
        np.testing.assert_allclose(poses_sharded, poses_vmap, atol=5e-4)
