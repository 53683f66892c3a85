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

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _block_indicator(n: int, block: int, nb: int) -> np.ndarray:
    """(nb, n) 0/1 matrix: row k selects elements k*block..k*block+block-1."""
    m = np.zeros((nb, n), np.float32)
    for k in range(nb):
        m[k, k * block : (k + 1) * block] = 1.0
    return m


def patch_histogram(edges: jax.Array, patch_size: int):
    """Edge count per (patch_size x patch_size) patch + occupancy fraction.

    Returns (counts (Hp, Wp) int32, occupancy scalar float) where occupancy =
    fraction of patches with >= 1 edge pixel (generateDistHistogram's
    nDist/total, imgpyramidrgbd.cpp:159-167).  Image dims are truncated to
    whole patches like the integer division in the reference.

    Block pooling is expressed as two small matmuls with static 0/1
    indicator matrices (counts = Ih @ E @ Iw^T): the reshape-to-4D reduce
    regroups 20-px blocks across both sublanes and lanes, which costs more
    in relayouts on TPU than the MXU does for the (Hp,H)x(H,W)x(W,Wp)
    contraction.  Counts are < 2^24, so the f32 matmul is exact.
    """
    h, w = edges.shape
    hp, wp = h // patch_size, w // patch_size
    ih = jnp.asarray(_block_indicator(h, patch_size, hp))
    iw = jnp.asarray(_block_indicator(w, patch_size, wp))
    e = (edges > 0).astype(jnp.float32)
    counts_f = _PREC_DOT(ih, _PREC_DOT(e, iw.T))
    counts = counts_f.astype(jnp.int32)
    occupancy = (counts > 0).mean(dtype=jnp.float32)
    return counts, occupancy


def _PREC_DOT(a, b):
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


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
    if parent_patch_size % 2 == 0:
        # Strided formulation (no gathers): par is just the odd-coordinate
        # strided slice of the parent, and because (2y+1)//(2m) == y//m the
        # patch lookup is a plain m-fold upsample of the count grid (with
        # edge replication standing in for the reference's index clamp).
        half = parent_patch_size // 2
        par = parent_edges[1::2, 1::2]
        par = jnp.pad(
            par, ((0, h - par.shape[0]), (0, w - par.shape[1]))
        )  # zero pad == the in_par out-of-range mask
        sparse_small = counts < thresh
        sp = jnp.repeat(
            jnp.repeat(sparse_small, half, axis=0), half, axis=1
        )
        sp = sp[: min(h, sp.shape[0]), : min(w, sp.shape[1])]
        sp = jnp.pad(
            sp,
            ((0, h - sp.shape[0]), (0, w - sp.shape[1])),
            mode="edge",
        )
        return edges | (sp & (par > 0))

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
