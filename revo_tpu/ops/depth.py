"""Valid-pixel depth downsampling ("subsample with holes").

Replaces ImgPyramidRGBD::FilterSubsampleWithHoles (imgpyramidrgbd.h:218-249,
InfiniTAM-derived): each output pixel is the mean of the >0 pixels of its
2x2 source block; 0 if the whole block is invalid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def subsample_depth_with_holes(depth: jax.Array) -> jax.Array:
    """(H, W) float depth -> (H//2, W//2), averaging only valid (>0) pixels.

    The reference truncates odd sizes (out = in/2, imgpyramidrgbd.h:220);
    we do the same by dropping the last row/col when odd.
    """
    h, w = depth.shape
    d = depth[: h - h % 2, : w - w % 2]
    blocks = d.reshape(d.shape[0] // 2, 2, d.shape[1] // 2, 2)
    valid = blocks > 0.0
    count = valid.sum(axis=(1, 3))
    total = jnp.where(valid, blocks, 0.0).sum(axis=(1, 3))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)
