"""Loop closure (revo_tpu.loopclosure): detect a revisit, verify it with
the DT tracker, and pull a drifted trajectory back with pose-graph GN.

The keyframes are posed directly (rendered at known ground truth with
drifted pose estimates attached) so the test isolates the loop-closure
pipeline itself; organic keyframe promotion is covered by test_system.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from revo_tpu import lie
from revo_tpu.frontend import build_frame, make_keyframe
from revo_tpu.io.synthetic import SyntheticScene, render_frame
from revo_tpu.loopclosure import (
    close_loops,
    find_candidates,
    reanchor_trajectory,
    verify_candidate,
    verify_candidates_batched,
)
from revo_tpu.system import PoseNode
from test_solver import small_cfg


def _loop_keyframes():
    """Four keyframes along a small loop: out, around, and back to ~5 cm
    from the start.  Ground-truth poses render the imagery; the attached
    estimates carry progressive drift (up to ~4.5 cm at the loop end)."""
    cfg = small_cfg()
    scene = SyntheticScene()
    xis = [
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [0.30, 0.02, 0.03, 0.0, 0.10, 0.0],
        [0.18, -0.02, 0.12, 0.0, -0.04, 0.0],
        [0.03, 0.01, 0.02, 0.0, 0.01, 0.0],  # near the start again
    ]
    gt = []
    for xi in xis:
        dR, dt = lie.exp_se3(jnp.asarray(xi, jnp.float32))
        gt.append(np.asarray(lie.matrix_from_rt(dR, dt)))
    drift = np.array([0.0, 0.015, 0.03, 0.045], np.float32)
    kfs, drifted_T = [], []
    for i, T in enumerate(gt):
        g, d = render_frame(scene, cfg.camera, T.astype(np.float32))
        f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
        Td = T.copy().astype(np.float32)
        Td[:3, 3] += np.array([drift[i], 0.5 * drift[i], 0.0], np.float32)
        kfs.append(make_keyframe(f, jnp.asarray(Td), cfg))
        drifted_T.append(Td)
    return cfg, kfs, np.stack(gt).astype(np.float32), np.stack(drifted_T)


class TestFindCandidates:
    def test_proximity_and_separation(self):
        eye = np.eye(4, dtype=np.float32)
        far = eye.copy()
        far[:3, 3] = [5, 0, 0]
        near = eye.copy()
        near[:3, 3] = [0.1, 0, 0]
        cands = find_candidates(
            [eye, far, far, near], min_separation=2, radius=0.5
        )
        assert (0, 3) in cands
        assert all(b - a > 2 for a, b in cands)


class TestCloseLoops:
    def test_drifted_loop_recovers(self):
        cfg, kfs, gt, drifted_T = _loop_keyframes()
        corrected, loops = close_loops(
            kfs, cfg, min_separation=2, radius=0.3
        )
        assert any(e.a == 0 and e.b == 3 for e in loops), (
            f"loop 0-3 not closed: {[(e.a, e.b) for e in loops]}"
        )
        # The verified relative pose must match ground truth despite the
        # drifted initialization (the imagery is undrifted).
        for e in loops:
            T_ab_gt = np.linalg.inv(gt[e.a]) @ gt[e.b]
            d = np.linalg.inv(e.T_ab) @ T_ab_gt
            assert np.linalg.norm(d[:3, 3]) < 0.015, (
                f"loop edge {e.a}-{e.b} off by "
                f"{np.linalg.norm(d[:3, 3]) * 100:.1f} cm"
            )
        # Correction must pull the loop-end keyframe back toward truth.
        derr = np.linalg.norm(drifted_T[3, :3, 3] - gt[3, :3, 3])
        cerr = np.linalg.norm(corrected[3, :3, 3] - gt[3, :3, 3])
        assert cerr < 0.6 * derr, f"corrected {cerr:.3f} vs drift {derr:.3f}"

    def test_reanchor_uses_kf_ordinals(self):
        cfg, kfs, gt, drifted_T = _loop_keyframes()
        corrected, _ = close_loops(kfs, cfg, min_separation=2, radius=0.3)
        rel = np.eye(4, dtype=np.float32)
        rel[:3, 3] = [0.01, 0.0, 0.0]
        graph = [
            PoseNode(
                T_kf_curr=rel,
                T_w_kf=drifted_T[i],
                timestamp=float(i),
                kf_ordinal=i,
            )
            for i in range(4)
        ]
        traj = reanchor_trajectory(graph, corrected)
        np.testing.assert_allclose(
            traj, np.einsum("kij,jl->kil", corrected, rel), atol=1e-6
        )

    def test_no_candidates_is_identity(self):
        cfg, kfs, gt, drifted_T = _loop_keyframes()
        poses, loops = close_loops(kfs, cfg, radius=1e-6)
        np.testing.assert_array_equal(poses, drifted_T)
        assert loops == []


class TestBatchedVerification:
    def test_batched_matches_serial(self):
        """ONE vmapped dispatch over all candidate pairs must reproduce the
        serial per-candidate verification exactly: same accept/reject
        verdicts, same relative poses (under vmap each element's LM
        while_loops run their own predicates with masked updates)."""
        cfg, kfs, gt, drifted_T = _loop_keyframes()
        # All admissible pairs, including ones the verifier should reject.
        cands = [(0, 2), (0, 3), (1, 3)]
        serial = [verify_candidate(kfs[a], kfs[b], cfg) for a, b in cands]
        batched = verify_candidates_batched(kfs, cands, cfg)
        assert len(batched) == len(serial)
        for (a, b), s, v in zip(cands, serial, batched):
            assert (s is None) == (v is None), f"verdict mismatch on {a}-{b}"
            if s is not None:
                np.testing.assert_allclose(
                    v[0], s[0], atol=1e-5,
                    err_msg=f"pose mismatch on {a}-{b}",
                )
                assert abs(v[1] - s[1]) < 1e-4

    def test_empty_candidates(self):
        cfg, kfs, *_ = _loop_keyframes()
        assert verify_candidates_batched(kfs, [], cfg) == []
