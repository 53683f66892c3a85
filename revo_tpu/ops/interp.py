"""Bilinear multi-channel sampling at float coordinates.

Replaces Optimizer::getInterpolatedElement43 (optimizer.h:173-185): sample an
(H, W, C) tensor at (u, v) with weights computed from the fractional parts,
using the reference's exact 4-tap formula.  Coordinates are truncated (C-style
int cast) like the reference; callers guarantee in-bounds coordinates
(1 < u < W-2, 1 < v < H-2 — optimizer.cpp:100), out-of-bounds lanes must be
masked by the caller (indices are clamped here only to stay memory-safe).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Sample (H, W, C) ``img`` at float pixel coords (u, v) of shape (N,).

    Returns (N, C).  Weighting matches optimizer.h:173-185:
        out = dxdy*I[iy+1,ix+1] + (dy-dxdy)*I[iy+1,ix]
            + (dx-dxdy)*I[iy,ix+1] + (1-dx-dy+dxdy)*I[iy,ix]
    """
    h, w = img.shape[0], img.shape[1]
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = u - ix.astype(u.dtype)
    dy = v - iy.astype(v.dtype)
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)

    flat = img.reshape(h * w, -1)
    base = iy * w + ix
    i00 = jnp.take(flat, base, axis=0)
    i01 = jnp.take(flat, base + 1, axis=0)
    i10 = jnp.take(flat, base + w, axis=0)
    i11 = jnp.take(flat, base + w + 1, axis=0)

    dxdy = (dx * dy)[:, None]
    dxe = dx[:, None]
    dye = dy[:, None]
    return (
        dxdy * i11
        + (dye - dxdy) * i10
        + (dxe - dxdy) * i01
        + (1.0 - dxe - dye + dxdy) * i00
    )


def bilinear_sample_quad(
    quad: jax.Array,
    u: jax.Array,
    v: jax.Array,
    h: int | None = None,
    w: int | None = None,
) -> jax.Array:
    """bilinear_sample against a packed 2x2-neighborhood quad table
    (ops.edt.quad_structure): ONE row take fetches the whole 2x2xC
    neighborhood, quartering the dominant scalarized-gather cost.

    The table form is inferred from the shape (the storage layout is a
    measured knob — XLA's TPU gather emitter prefers different operand
    layouts in different surrounding programs, see OptimizerConfig.quad_form):
      - (H, W, 4*C): 3-D table, reshaped to rows here.
      - (H*W, 4*C): pre-flattened rows ("flat"; needs h, w).
      - (4*C, H*W): transposed ("t"; needs h, w) — the minormost-index
        layout the batched-step gather emitter otherwise copies into.
    Bit-identical weights/formula to bilinear_sample.
    """
    if quad.ndim == 3:
        h, w = quad.shape[0], quad.shape[1]
        flat = quad.reshape(h * w, quad.shape[2])
        transposed = False
    elif quad.shape[0] < quad.shape[1]:  # (4*C, H*W)
        flat = quad
        transposed = True
    else:  # (H*W, 4*C)
        flat = quad
        transposed = False
    c = (flat.shape[1] if not transposed else flat.shape[0]) // 4
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = (u - ix.astype(u.dtype))[:, None]
    dy = (v - iy.astype(v.dtype))[:, None]
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)
    base = iy * w + ix
    if transposed:
        q = jnp.take(flat, base, axis=1).T  # (N, 4*C)
    else:
        # Under vmap this becomes a batch-dim gather; flattening the batch
        # into offset indices via custom_vmap was measured STRICTLY WORSE
        # (B=8 step 61.5 -> 75.7 ms on v5e) — keep the plain take.
        q = jnp.take(flat, base, axis=0)  # (N, 4*C)
    i00 = q[:, 0 * c : 1 * c]
    i01 = q[:, 1 * c : 2 * c]
    i10 = q[:, 2 * c : 3 * c]
    i11 = q[:, 3 * c : 4 * c]
    dxdy = dx * dy
    return (
        dxdy * i11
        + (dy - dxdy) * i10
        + (dx - dxdy) * i01
        + (1.0 - dx - dy + dxdy) * i00
    )


def gather2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img[iy, ix] for (N,) int32 indices via a windowed lax.gather.

    (H, W) -> (N,); (H, W, C) -> (N, C).  Advanced integer indexing (and
    jnp.take on a flattened image) lowers to a slow scalarized gather on
    TPU; the explicit (1, 1[, C]) slice gather takes the fast path —
    measured ~66x faster at 24k points on v5e.  Start indices are clipped
    (mode="clip"), matching jnp.take's default clamp.
    """
    starts = jnp.stack([iy, ix], axis=-1)  # (N, 2)
    if img.ndim == 2:
        out = jax.lax.gather(
            img,
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(),
                collapsed_slice_dims=(0, 1),
                start_index_map=(0, 1),
            ),
            slice_sizes=(1, 1),
            mode="clip",
        )
        return out
    return jax.lax.gather(
        img,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,),
            collapsed_slice_dims=(0, 1),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, 1, img.shape[2]),
        mode="clip",
    )


def bilinear_sample_taps(
    img: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """bilinear_sample via four gather2d (1, 1, C)-slice gathers.

    A third gather emission for in-context A/B against the 4-take and
    windowed forms (XLA's TPU gather emitter choice is context-dependent;
    see the solver notes)."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = (u - ix.astype(u.dtype))[:, None]
    dy = (v - iy.astype(v.dtype))[:, None]
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)
    i00 = gather2d(img, iy, ix)
    i01 = gather2d(img, iy, ix + 1)
    i10 = gather2d(img, iy + 1, ix)
    i11 = gather2d(img, iy + 1, ix + 1)
    dxdy = dx * dy
    return (
        dxdy * i11
        + (dy - dxdy) * i10
        + (dx - dxdy) * i01
        + (1.0 - dx - dy + dxdy) * i00
    )


def bilinear_sample_pair(
    img: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """bilinear_sample via TWO (2, C)-slice gathers on the flattened image.

    In row-major (H*W, C) layout the taps (iy,ix)/(iy,ix+1) are adjacent
    rows, as are (iy+1,ix)/(iy+1,ix+1): one slice gather per row pair
    fetches both, halving the gather count vs the 4-take form.
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = (u - ix.astype(u.dtype))[:, None]
    dy = (v - iy.astype(v.dtype))[:, None]
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)
    flat = img.reshape(h * w, c)
    base = (iy * w + ix)[:, None]  # (N, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    top = jax.lax.gather(flat, base, dn, slice_sizes=(2, c), mode="clip")
    bot = jax.lax.gather(flat, base + w, dn, slice_sizes=(2, c), mode="clip")
    i00, i01 = top[:, 0], top[:, 1]
    i10, i11 = bot[:, 0], bot[:, 1]
    dxdy = dx * dy
    return (
        dxdy * i11
        + (dy - dxdy) * i10
        + (dx - dxdy) * i01
        + (1.0 - dx - dy + dxdy) * i00
    )


def bilinear_sample_window_ob(
    img: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """bilinear_sample_window with an optimization_barrier isolating the
    gather from its producers/consumers.

    XLA's TPU gather emitter choice is context-dependent (fast standalone
    gather vs scalarized loop fusion when fused with producers); the
    barrier pins the standalone form inside large fused steps."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = (u - ix.astype(u.dtype))[:, None]
    dy = (v - iy.astype(v.dtype))[:, None]
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)
    starts = jnp.stack([iy, ix], axis=-1)  # (N, 2)
    img_b, starts_b = jax.lax.optimization_barrier((img, starts))
    win = jax.lax.gather(
        img_b,
        starts_b,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, img.shape[2]),
        mode="clip",
    )  # (N, 2, 2, C)
    win = jax.lax.optimization_barrier(win)
    dxdy = dx * dy
    return (
        dxdy * win[:, 1, 1]
        + (dy - dxdy) * win[:, 1, 0]
        + (dx - dxdy) * win[:, 0, 1]
        + (1.0 - dx - dy + dxdy) * win[:, 0, 0]
    )


def bilinear_sample_window(
    img: jax.Array, u: jax.Array, v: jax.Array
) -> jax.Array:
    """Same math as bilinear_sample via ONE lax.gather of (2, 2, C) windows.

    Each point fetches its whole 2x2xC neighborhood in a single gather
    slice instead of four row gathers — the row gathers scalarize on TPU
    while the windowed slice gather runs at memory speed (~66x faster per
    residual pass at 24k points on v5e).
    """
    h, w = img.shape[0], img.shape[1]
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)
    dx = (u - ix.astype(u.dtype))[:, None]
    dy = (v - iy.astype(v.dtype))[:, None]
    ix = jnp.clip(ix, 0, w - 2)
    iy = jnp.clip(iy, 0, h - 2)
    starts = jnp.stack([iy, ix], axis=-1)  # (N, 2)
    win = jax.lax.gather(
        img,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, img.shape[2]),
        mode="clip",
    )  # (N, 2, 2, C)
    dxdy = dx * dy
    return (
        dxdy * win[:, 1, 1]
        + (dy - dxdy) * win[:, 1, 0]
        + (dx - dxdy) * win[:, 0, 1]
        + (1.0 - dx - dy + dxdy) * win[:, 0, 0]
    )
