"""Tests for pose-graph GN optimization, single-device and sharded.

Distributed path runs on the 8-virtual-device CPU mesh (conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np

from revo_tpu import lie
from revo_tpu.parallel import (
    PoseGraphEdges,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    pose_graph_residuals,
)
from revo_tpu.parallel.posegraph import trajectory_to_edges


def _random_trajectory(n, seed=0, step=0.1):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n - 1, 6)).astype(np.float32) * step
    poses = [np.eye(4, dtype=np.float32)]
    for xi in xs:
        dR, dt = lie.exp_se3(jnp.asarray(xi))
        poses.append(poses[-1] @ np.asarray(lie.matrix_from_rt(dR, dt)))
    return jnp.asarray(np.stack(poses))


def _perturb(poses, seed=1, scale=0.05):
    rng = np.random.default_rng(seed)
    n = poses.shape[0]
    xi = rng.normal(size=(n, 6)).astype(np.float32) * scale
    xi[0] = 0.0  # keep the gauge node exact
    dR, dt = lie.exp_se3(jnp.asarray(xi))
    dT = lie.matrix_from_rt(dR, dt)
    return dT @ poses


def _mean_residual(poses, edges):
    r = pose_graph_residuals(poses, edges)
    w = edges.weight > 0
    return float(jnp.sqrt((r[w] ** 2).sum(-1)).mean())


class TestPoseGraph:
    def test_residuals_zero_on_consistent_graph(self):
        poses = _random_trajectory(10)
        edges = trajectory_to_edges(poses)
        r = pose_graph_residuals(poses, edges)
        assert float(jnp.abs(r).max()) < 1e-5

    def test_recovers_perturbed_chain(self):
        poses = _random_trajectory(15)
        edges = trajectory_to_edges(poses)
        noisy = _perturb(poses)
        assert _mean_residual(noisy, edges) > 0.01
        refined = optimize_pose_graph(noisy, edges, iters=15)
        assert _mean_residual(refined, edges) < 1e-4
        # Gauge: node 0 unchanged.
        np.testing.assert_allclose(
            np.asarray(refined[0]), np.asarray(poses[0]), atol=1e-5
        )

    def test_loop_closure_distributes_error(self):
        """Chain + loop-closure edge: drift gets spread along the loop."""
        poses = _random_trajectory(12, step=0.15)
        edges = trajectory_to_edges(poses)
        # add loop edge between 0 and last with the TRUE relative pose
        loop = PoseGraphEdges(
            i=jnp.asarray([0], jnp.int32),
            j=jnp.asarray([11], jnp.int32),
            T_meas=(jnp.linalg.inv(poses[0]) @ poses[11])[None],
            weight=jnp.asarray([5.0], jnp.float32),
        )
        all_edges = PoseGraphEdges(
            i=jnp.concatenate([edges.i, loop.i]),
            j=jnp.concatenate([edges.j, loop.j]),
            T_meas=jnp.concatenate([edges.T_meas, loop.T_meas]),
            weight=jnp.concatenate([edges.weight, loop.weight]),
        )
        noisy = _perturb(poses, scale=0.08)
        refined = optimize_pose_graph(noisy, all_edges, iters=20)
        # end node must be pulled to consistency with the loop edge
        r = pose_graph_residuals(refined, loop)
        assert float(jnp.linalg.norm(r)) < 1e-3

    def test_padding_edges_ignored(self):
        poses = _random_trajectory(8)
        edges = trajectory_to_edges(poses)
        padded = PoseGraphEdges(
            i=jnp.concatenate([edges.i, jnp.zeros(5, jnp.int32)]),
            j=jnp.concatenate([edges.j, jnp.zeros(5, jnp.int32)]),
            T_meas=jnp.concatenate(
                [edges.T_meas, jnp.tile(jnp.eye(4), (5, 1, 1))]
            ),
            weight=jnp.concatenate([edges.weight, jnp.zeros(5)]),
        )
        noisy = _perturb(poses)
        a = optimize_pose_graph(noisy, edges, iters=10)
        b = optimize_pose_graph(noisy, padded, iters=10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestShardedPoseGraph:
    def test_matches_single_device(self):
        """Edge-sharded psum reduction == single-device result."""
        n_dev = len(jax.devices())
        assert n_dev == 8, "conftest must provide 8 virtual devices"
        poses = _random_trajectory(17)
        edges = trajectory_to_edges(poses)  # 16 edges = 2 per device
        noisy = _perturb(poses)

        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("edge",))
        refined_sharded = optimize_pose_graph_sharded(
            noisy, edges, mesh, axis="edge", iters=10
        )
        refined_single = optimize_pose_graph(noisy, edges, iters=10)
        np.testing.assert_allclose(
            np.asarray(refined_sharded),
            np.asarray(refined_single),
            atol=1e-4,
        )
        assert _mean_residual(refined_sharded, edges) < 1e-4
