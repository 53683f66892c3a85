"""TUM RGB-D dataset IO: associate parsing, image loading, pose files.

Replaces the dataset modality of IOWrapperRGBD (iowrapperRGBD.cpp:257-333):
``associate.txt`` lines are "rgbTs rgbPath depthTs depthPath"; depth PNGs are
16-bit scaled by DEPTH_SCALE_FACTOR (5000 for TUM).  Pose output follows the
TUM format written by REVO::writePose (system.cpp:76-80):
``timestamp tx ty tz qx qy qz qw``.
"""
from __future__ import annotations

import os
from typing import List, NamedTuple, Tuple

import numpy as np


class Association(NamedTuple):
    rgb_ts: float
    rgb_path: str
    depth_ts: float
    depth_path: str


def load_associations(
    dataset_dir: str,
    associate_file: str = "associate.txt",
    skip_first: int = 0,
    max_frames: int | None = None,
) -> List[Association]:
    """Parse associate.txt (iowrapperRGBD.cpp:301-333); '#' lines skipped."""
    out: List[Association] = []
    with open(os.path.join(dataset_dir, associate_file)) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) != 4:
                continue
            out.append(
                Association(
                    float(parts[0]), parts[1], float(parts[2]), parts[3]
                )
            )
    out = out[skip_first:]
    if max_frames is not None:
        out = out[:max_frames]
    return out


def load_tum_frame(
    dataset_dir: str, assoc: Association, depth_scale: float = 5000.0
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Load one (gray f32, depth f32 metres, timestamp) frame.

    rgb is read and converted to gray with OpenCV weights; 16-bit depth is
    scaled by 1/DEPTH_SCALE_FACTOR (iowrapperRGBD.cpp:325-327).
    """
    import cv2  # host-side decode only; never on the device path

    rgb = cv2.imread(os.path.join(dataset_dir, assoc.rgb_path))
    depth_raw = cv2.imread(
        os.path.join(dataset_dir, assoc.depth_path), cv2.IMREAD_UNCHANGED
    )
    if rgb is None or depth_raw is None:
        raise FileNotFoundError(
            f"missing {assoc.rgb_path} / {assoc.depth_path} in {dataset_dir}"
        )
    gray = cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY).astype(np.float32)
    depth = depth_raw.astype(np.float32) / depth_scale
    return gray, depth, assoc.rgb_ts


def write_tum_trajectory(
    path: str, timestamps, translations, quaternions_xyzw
) -> None:
    """Write a TUM pose file: 'ts tx ty tz qx qy qz qw' with 9 decimals,
    exactly like REVO::writePose (system.cpp:76-80)."""
    with open(path, "w") as f:
        for ts, t, q in zip(timestamps, translations, quaternions_xyzw):
            f.write(
                f"{ts:.6f} "
                f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}\n"
            )


def read_tum_trajectory(path: str):
    """Read a TUM pose file -> (timestamps (N,), poses (N, 4, 4))."""
    from revo_tpu import lie
    import jax.numpy as jnp

    ts_list, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            if len(vals) != 8:
                continue
            ts_list.append(vals[0])
            t = np.array(vals[1:4], np.float32)
            q = np.array(vals[4:8], np.float32)
            R = np.asarray(lie.matrix_from_quaternion(jnp.asarray(q)))
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t
            poses.append(T)
    return np.array(ts_list), np.stack(poses) if poses else np.zeros((0, 4, 4))
