"""Oracle test: histogram voting vs a NumPy re-implementation of the
reference loops (assessTrackingQuality, tracker.cpp:118-201)."""
import jax.numpy as jnp
import numpy as np

from revo_tpu import tracker
from revo_tpu.frontend import build_frame
from revo_tpu.io.synthetic import SyntheticScene, render_frame

from test_solver import small_cfg


def _reference_voting(past_pts, past_valid, past_poses, n_past, est_pose,
                      depth, edges, cam, depth_min, depth_max, weights):
    """Direct transcription of tracker.cpp:138-200 in NumPy."""
    h, w = depth.shape
    M = np.zeros((h, w), np.int32)
    for s in range(min(n_past, len(past_pts))):
        T = np.linalg.inv(est_pose) @ past_poses[s]
        R, t = T[:3, :3], T[:3, 3]
        Mi = np.zeros((h, w), np.int32)
        pts = past_pts[s][past_valid[s]]
        for p in pts:
            q = R @ p + t
            u = q[0] / q[2] * cam.fx + cam.cx
            v = q[1] / q[2] * cam.fy + cam.cy
            if 0 <= u < w and 0 <= v < h:
                Mi[int(np.floor(v)), int(np.floor(u))] = 1
        M += Mi
    histogram = np.zeros(len(past_pts) + 1)
    overlaps = np.zeros(len(past_pts) + 1)
    for yy in range(h):
        for xx in range(w):
            z = depth[yy, xx]
            if np.isfinite(z) and depth_min < z < depth_max:
                val = M[yy, xx]
                histogram[val] += 1
                if edges[yy, xx]:
                    overlaps[val] += 1
    overlap_measure = sum(
        overlaps[k] * weights[k] for k in range(1, len(overlaps))
    )
    if n_past < 3:
        return False  # histogram.size() < 4 guard
    return overlap_measure < overlaps[0]


class TestVotingOracle:
    def test_matches_reference_loops(self):
        cfg = small_cfg()
        scene = SyntheticScene()
        lvl = cfg.tracker.histogram_level
        cam = cfg.camera_pyramid()[lvl]

        past = tracker.empty_past(3, cfg.pyramid.edge_capacity[lvl])
        poses_np, pts_np, valid_np = [], [], []
        for i in range(3):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 0.01 * i
            g, d = render_frame(scene, cfg.camera, T)
            f = build_frame(jnp.asarray(g), jnp.asarray(d), cfg)
            cl = f.levels[lvl].cloud
            past = tracker.push_past(past, cl.points, cl.valid, jnp.asarray(T))
            pts_np.append(np.asarray(cl.points))
            valid_np.append(np.asarray(cl.valid))
            poses_np.append(T)

        gq, dq = render_frame(scene, cfg.camera, poses_np[-1])
        fq = build_frame(jnp.asarray(gq), jnp.asarray(dq), cfg)

        # Several query poses: matching, drifted, far-off.
        for dxs in [0.0, 0.15, 5.0]:
            est = poses_np[-1].copy()
            est[0, 3] += dxs
            got = bool(
                tracker.assess_tracking_quality(
                    past, jnp.asarray(est), fq, cfg
                )
            )
            want = _reference_voting(
                pts_np, valid_np, poses_np, 3, est,
                np.asarray(fq.levels[lvl].depth),
                np.asarray(fq.levels[lvl].edges_orig),
                cam, cfg.pyramid.depth_min, cfg.pyramid.depth_max,
                cfg.tracker.hist_weights,
            )
            assert got == want, f"dx={dxs}: got {got}, want {want}"
