"""Tests: undistortion maps vs cv2 oracle; TUM recorder round-trip."""
import os

import cv2
import jax.numpy as jnp
import numpy as np

from revo_tpu.config import CameraConfig
from revo_tpu.io.recorder import TUMRecorder
from revo_tpu.io.tum import load_associations, load_tum_frame
from revo_tpu.ops.undistort import build_undistort_maps, remap_bilinear

from test_ops import synthetic_gray


CAM_DIST = CameraConfig(
    fx=200.0, fy=201.0, cx=81.0, cy=59.5, width=160, height=120,
    distortion=(0.26, -0.95, -0.005, 0.0026, 1.16),  # TUM fr1 coefficients
)


class TestUndistort:
    def test_maps_match_opencv(self):
        K = np.array(
            [[CAM_DIST.fx, 0, CAM_DIST.cx], [0, CAM_DIST.fy, CAM_DIST.cy],
             [0, 0, 1]]
        )
        dist = np.array(CAM_DIST.distortion)
        mu_cv, mv_cv = cv2.initUndistortRectifyMap(
            K, dist, np.eye(3), K, (CAM_DIST.width, CAM_DIST.height),
            cv2.CV_32FC1,
        )
        mu, mv = build_undistort_maps(CAM_DIST)
        np.testing.assert_allclose(mu, mu_cv, atol=2e-2)
        np.testing.assert_allclose(mv, mv_cv, atol=2e-2)

    def test_remap_matches_opencv(self):
        img = synthetic_gray(120, 160, seed=1).astype(np.float32)
        mu, mv = build_undistort_maps(CAM_DIST)
        want = cv2.remap(img, mu, mv, cv2.INTER_LINEAR)
        got = np.asarray(
            remap_bilinear(jnp.asarray(img), jnp.asarray(mu), jnp.asarray(mv))
        )
        # interior comparison (border handling differs by design)
        inner = (slice(3, -3), slice(3, -3))
        np.testing.assert_allclose(got[inner], want[inner], atol=0.51)

    def test_zero_distortion_identity(self):
        cam = CameraConfig(fx=100, fy=100, cx=80, cy=60, width=160, height=120)
        mu, mv = build_undistort_maps(cam)
        u, v = np.meshgrid(np.arange(160.0), np.arange(120.0))
        np.testing.assert_allclose(mu, u, atol=1e-4)
        np.testing.assert_allclose(mv, v, atol=1e-4)


class TestRecorder:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        gray = rng.integers(0, 255, (48, 64)).astype(np.float32)
        depth = (rng.random((48, 64)) * 3).astype(np.float32)
        out = os.path.join(tmp_path, "rec")
        with TUMRecorder(out) as rec:
            rec.add(gray, depth, 100.0)
            rec.add(gray, depth, 100.033)
        assocs = load_associations(out)
        assert len(assocs) == 2
        g2, d2, ts = load_tum_frame(out, assocs[0])
        assert ts == 100.0
        np.testing.assert_allclose(g2, gray, atol=1.0)
        np.testing.assert_allclose(d2, depth, atol=1.0 / 5000.0 + 1e-4)
