"""Parallel & distributed layers: batching, segment parallelism, pose-graph BA.

This is the capability layer the reference lacks entirely (SURVEY.md §2.2):

- batch: vmapped/shard_map multi-sequence tracking (data parallelism over
  sequences — BASELINE.json config 4)
- posegraph: pose-graph Gauss-Newton and windowed bundle adjustment, with a
  shard_map/psum distributed reduction of the block normal equations
  (BASELINE.json config 5)
- segments: segment-parallel tracking of long sequences with overlap
  stitching (the sequence-parallel/CP analog for video, SURVEY.md §5)
"""

from revo_tpu.parallel.posegraph import (
    PoseGraphEdges,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    pose_graph_residuals,
)

__all__ = [
    "PoseGraphEdges",
    "optimize_pose_graph",
    "optimize_pose_graph_sharded",
    "pose_graph_residuals",
]
