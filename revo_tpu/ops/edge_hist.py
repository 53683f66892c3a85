"""BMVC17 edge-histogram fill-in.

Replaces ImgPyramidRGBD::generateDistHistogram / fillInEdges
(imgpyramidrgbd.cpp:111-172): a per-patch edge-count map decides whether a
coarse pyramid level is too sparsely covered; if so, edges from the finer
parent level are copied down into the empty patches.

Deviation from the reference (documented): patch counts use int32 instead of
the reference's uint8 (which silently wraps at 256 for 20x20 patches,
imgpyramidrgbd.cpp:148-154) — wrap-around could make a dense patch look
empty; we keep exact counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def patch_histogram(edges: jax.Array, patch_size: int):
    """Edge count per (patch_size x patch_size) patch + occupancy fraction.

    Returns (counts (Hp, Wp) int32, occupancy scalar float) where occupancy =
    fraction of patches with >= 1 edge pixel (generateDistHistogram's
    nDist/total, imgpyramidrgbd.cpp:159-167).  Image dims are truncated to
    whole patches like the integer division in the reference.
    """
    h, w = edges.shape
    hp, wp = h // patch_size, w // patch_size
    e = (edges[: hp * patch_size, : wp * patch_size] > 0).astype(jnp.int32)
    counts = e.reshape(hp, patch_size, wp, patch_size).sum(axis=(1, 3))
    occupancy = (counts > 0).mean(dtype=jnp.float32)
    return counts, occupancy


def fill_in_edges(
    edges: jax.Array,
    parent_edges: jax.Array,
    counts: jax.Array,
    patch_size: int,
    parent_patch_size: int,
) -> jax.Array:
    """Copy parent-level edges down into sparsely covered patches.

    Mirrors fillInEdges (imgpyramidrgbd.cpp:130-140): for parent pixels at
    odd coordinates (yy%2==1, xx%2==1) whose patch count (indexed by parent
    coords / parent patch size) is below patch_size^2 * 0.05, an edge in the
    parent sets edges[yy//2, xx//2].
    """
    h, w = edges.shape
    ph, pw = parent_edges.shape
    thresh = patch_size * patch_size * 0.05

    # Parent pixels at odd coords map to child pixel (yy//2, xx//2); the
    # child pixel (y, x) receives parent pixel (2y+1, 2x+1).
    yy = 2 * jnp.arange(h) + 1
    xx = 2 * jnp.arange(w) + 1
    in_par = (yy[:, None] < ph) & (xx[None, :] < pw)
    par = parent_edges[jnp.minimum(yy, ph - 1)[:, None],
                       jnp.minimum(xx, pw - 1)[None, :]]

    # Patch lookup uses parent coords / parent patch size
    # (imgpyramidrgbd.cpp:133); guard against patch-grid overflow.
    py = jnp.minimum(yy // parent_patch_size, counts.shape[0] - 1)
    px = jnp.minimum(xx // parent_patch_size, counts.shape[1] - 1)
    sparse = counts[py[:, None], px[None, :]] < thresh

    return edges | (in_par & sparse & (par > 0))
