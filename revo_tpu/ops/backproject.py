"""Edge back-projection into fixed-capacity 3-D point clouds.

Replaces the dynamic-size edge cloud of ImgPyramidRGBD::addLevelEdge
(imgpyramidrgbd.cpp:199-226): every edge pixel with valid depth becomes a 3-D
point X = Z*(x-cx)/fx, Y = Z*(y-cy)/fy, Z.  TPU requires static shapes, so
the cloud is a (P, 3) array with a validity mask; compaction uses
jnp.nonzero(size=P), which pads with index 0 (masked out downstream).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EdgeCloud(NamedTuple):
    """Fixed-capacity edge point cloud for one pyramid level."""

    points: jax.Array  # (P, 3) float32 camera-frame points
    valid: jax.Array  # (P,) bool
    count: jax.Array  # () int32 number of real points (may exceed P if clipped)


def backproject_edges(
    edges: jax.Array,
    depth: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    depth_min: float,
    depth_max: float,
    capacity: int,
) -> EdgeCloud:
    """Edge pixels with finite depth in (depth_min, depth_max) -> EdgeCloud.

    Validity predicate mirrors isPointOkEdgePyr (imgpyramidrgbd.h:176-180):
    edge > 0 and isfinite(Z) and DEPTH_MIN < Z < DEPTH_MAX (strict).
    """
    h, w = edges.shape
    valid_px = (
        (edges > 0)
        & jnp.isfinite(depth)
        & (depth > depth_min)
        & (depth < depth_max)
    )
    count = valid_px.sum().astype(jnp.int32)

    # Stream compaction as one exclusive scan + one scatter (ascending
    # order, first-`capacity` truncation and 0-fill exactly like
    # jnp.nonzero(size=capacity, fill_value=0), but without its second
    # cumsum + bincount round trip).
    flat = valid_px.ravel()
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    tgt = jnp.where(flat & (pos < capacity), pos, capacity)
    idx = (
        jnp.zeros(capacity + 1, jnp.int32)
        .at[tgt]
        .set(jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop")
    )[:capacity]
    n = jnp.minimum(count, capacity)
    lane_valid = jnp.arange(capacity, dtype=jnp.int32) < n

    yi = idx // w
    xi = idx % w
    yy = yi.astype(jnp.float32)
    xx = xi.astype(jnp.float32)
    from revo_tpu.ops.interp import gather2d

    z = gather2d(depth, yi, xi)
    x3 = z * (xx - cx) / fx
    y3 = z * (yy - cy) / fy
    pts = jnp.stack([x3, y3, z], axis=-1)
    pts = jnp.where(lane_valid[:, None], pts, 0.0)
    return EdgeCloud(points=pts, valid=lane_valid, count=count)
