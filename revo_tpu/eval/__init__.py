"""Trajectory evaluation: ATE / RPE per the TUM RGB-D benchmark protocol."""

from revo_tpu.eval.ate import absolute_trajectory_error, relative_pose_error

__all__ = ["absolute_trajectory_error", "relative_pose_error"]
