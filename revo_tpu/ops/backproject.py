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

    # Stream compaction as one exclusive scan + one scatter.  When the
    # cloud fits, slots are the exact ascending compaction (matching the
    # reference's dynamic leftCols order, imgpyramidrgbd.cpp:226).  On
    # overflow the reference keeps everything (dynamic size); with a fixed
    # capacity something must be dropped, and a uniform stride decimation
    # (slot = floor(pos * capacity / count)) keeps full-image spatial
    # coverage instead of truncating away the bottom of the frame.  The
    # scatter writes flat_index+1 with max-combine so unwritten slots read
    # 0 == invalid — one scatter yields both indices and lane validity.
    flat = valid_px.ravel()
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    over = count > capacity
    scale = capacity / jnp.maximum(count, capacity).astype(jnp.float32)
    slot = jnp.where(
        over,
        jnp.floor(pos.astype(jnp.float32) * scale).astype(jnp.int32),
        pos,
    )
    tgt = jnp.where(flat & (slot < capacity), slot, capacity)
    idxp = (
        jnp.zeros(capacity + 1, jnp.int32)
        .at[tgt]
        .max(jnp.arange(1, flat.shape[0] + 1, dtype=jnp.int32), mode="drop")
    )[:capacity]
    lane_valid = idxp > 0
    idx = jnp.maximum(idxp - 1, 0)

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
