"""Exact Euclidean distance transform, fused with the gradient structure.

TPU-native replacement for cv::distanceTransform(255-edges, CV_DIST_L2,
CV_DIST_MASK_PRECISE) + ImgPyramidRGBD::buildOptimizationStructure
(imgpyramidrgbd.cpp:241,255-276).  The keyframe "optimization structure" is
an (H, W, 3) tensor with channels (gx, gy, dt) where

    gx = 0.5 * (dt[y, x-1] - dt[y, x+1])   # NOTE: negated central difference,
    gy = 0.5 * (dt[y-1, x] - dt[y+1, x])   # exactly as the reference computes
    dt = Euclidean distance to nearest edge pixel.

(The reference's sign convention is the negative gradient; the GN solver's
update sign compensates — see optimizer.cpp:258 `b = -ls.b`.)

Algorithm (exact, dense, VPU-friendly — no sequential lower-envelope stack):

1. Column pass: per-column nearest-edge distance via two directional scans
   (a lax.scan over rows carrying a (W,) running distance).  O(H*W).
2. Row pass: exact 1-D squared EDT per row, D(x) = min_i ((x-i)^2 + g(i)^2),
   evaluated as a tiled broadcast-min — O(H*W*W) dense f32 ops, which on TPU
   is cheap VPU work (~200M ops at 640x480) and runs only per keyframe.

This matches the exact EDT (and cv's MASK_PRECISE) to float tolerance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e9


def _column_distances(edges: jax.Array) -> jax.Array:
    """Per-pixel vertical distance to the nearest edge in the same column.

    Log-depth doubling instead of a sequential row scan: after step k,
    d[y] = min distance to an edge within the last 2^k rows, via
    d <- min(d, shift_down(d, s) + s) with s doubling.  ceil(log2 H)
    fully-vectorized (H, W) passes per direction replace a 2x H-step
    lax.scan whose per-iteration latency dominated keyframe cost on TPU
    (~30 ms of the 36 ms make_keyframe at 640x480; the doubling form
    makes it sub-ms).  Exact: the min-plus running-distance operator is
    associative.  Returns float (H, W); _BIG where a column has no edge.
    """
    h = edges.shape[0]
    e = edges.astype(jnp.bool_)
    init = jnp.where(e, 0.0, jnp.float32(_BIG))

    def direction(d, down: bool):
        s = 1
        while s < h:
            if down:  # shifted[y] = d[y - s]
                shifted = jnp.pad(
                    d, ((s, 0), (0, 0)), constant_values=_BIG
                )[:-s]
            else:  # shifted[y] = d[y + s]
                shifted = jnp.pad(
                    d, ((0, s), (0, 0)), constant_values=_BIG
                )[s:]
            d = jnp.minimum(d, shifted + s)
            s *= 2
        return d

    return jnp.minimum(direction(init, True), direction(init, False))


def _row_edt_sq(gsq: jax.Array, chunk: int = 128) -> jax.Array:
    """Exact 1-D squared EDT along rows: D(y,x) = min_i (x-i)^2 + gsq(y,i).

    Tiled over source columns to bound the (H, W, chunk) temporary.
    """
    h, w = gsq.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    n_chunks = (w + chunk - 1) // chunk

    def body(c, acc):
        i0 = c * chunk
        idx = i0 + jnp.arange(chunk)
        valid = idx < w
        i_coord = jnp.where(valid, idx, 0).astype(jnp.float32)
        g = jnp.where(valid, gsq[:, jnp.minimum(idx, w - 1)], _BIG)  # (H, chunk)
        # (W_out, chunk) horizontal squared offsets + (H, 1, chunk) parabola
        dx = xs[:, None] - i_coord[None, :]
        cand = dx[None, :, :] * dx[None, :, :] + g[:, None, :]  # (H, W, chunk)
        return jnp.minimum(acc, cand.min(axis=-1))

    # Init derived from the input so varying axes match under shard_map.
    acc0 = gsq * 0.0 + _BIG
    return jax.lax.fori_loop(0, n_chunks, body, acc0)


def distance_transform(edges: jax.Array) -> jax.Array:
    """Exact Euclidean distance (float32, (H, W)) to the nearest edge pixel.

    Matches cv::distanceTransform(255-edges, DIST_L2, DIST_MASK_PRECISE)
    (imgpyramidrgbd.cpp:241) to float precision; distance is 0 on edges.
    If the image has no edges at all, returns sqrt(_BIG)-scale values.
    """
    g = _column_distances(edges)
    dsq = _row_edt_sq(jnp.minimum(g * g, _BIG))
    return jnp.sqrt(dsq)


def build_optimization_structure(dt: jax.Array) -> jax.Array:
    """(H, W) distance transform -> (H, W, 3) tensor (gx, gy, dt).

    Mirrors buildOptimizationStructure (imgpyramidrgbd.cpp:255-276): negated
    central differences; border rows/cols use clamped neighbors (the
    reference leaves the first/last row undefined and excludes a 2-px border
    in the solver, so borders never contribute).
    """
    left = jnp.pad(dt, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    right = jnp.pad(dt, ((0, 0), (0, 1)), mode="edge")[:, 1:]
    up = jnp.pad(dt, ((1, 0), (0, 0)), mode="edge")[:-1, :]
    down = jnp.pad(dt, ((0, 1), (0, 0)), mode="edge")[1:, :]
    gx = 0.5 * (left - right)
    gy = 0.5 * (up - down)
    return jnp.stack([gx, gy, dt], axis=-1)


def keyframe_structure(edges: jax.Array) -> jax.Array:
    """Fused DT + gradients: the per-level keyframe tensor (makeKeyframe,
    imgpyramidrgbd.cpp:231-252)."""
    return build_optimization_structure(distance_transform(edges))


def quad_structure(struct: jax.Array, form: str = "hw12") -> jax.Array:
    """(H, W, 3) structure -> packed 2x2-neighborhood quad table for
    1-gather bilinear sampling.

    Q[y, x] = concat(S[y, x], S[y, x+1], S[y+1, x], S[y+1, x+1]) — the full
    2x2 bilinear neighborhood packed contiguously, so the solver's sample
    needs ONE row gather per pass instead of four (XLA's TPU gather
    scalarizes per row; the per-row cost is index overhead, not bytes).
    Built once per keyframe level.  The last row/column are edge-padded;
    they are unreachable because sample coords are clipped to (w-2, h-2).

    ``form`` picks the storage layout (OptimizerConfig.quad_form, a
    measured knob for the gather emitter): "hw12" = (H, W, 12),
    "flat" = (H*W, 12), "t" = (12, H*W), "flat16" = (H*W, 16) with each
    tap padded to 4 lanes (64-byte aligned rows), "flatbf" = (H*W, 12)
    bfloat16 (half the row bytes; samples upcast after the gather).

    "dt4" / "dt4bf" = (H*W, 4) dt-only taps (f32 / bf16): the solver
    derives the Jacobian gradient from the bilinear dt surface itself
    (interp.bilinear_sample_dtquad) instead of the interpolated central
    differences, cutting the gathered row to 16 / 8 bytes.  Residuals are
    bit-identical to the 12-component forms; only the gradient source
    differs (ATE-parity gated, tests/test_solver_modes.py).
    """
    if form in ("dt4", "dt4bf"):
        struct = struct[..., 2:3]  # dt channel only
    right = jnp.pad(struct, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    down = jnp.pad(struct, ((0, 1), (0, 0), (0, 0)), mode="edge")[1:]
    downright = jnp.pad(down, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:]
    taps = [struct, right, down, downright]
    if form == "flat16":
        pad = jnp.zeros_like(struct[..., :1])
        taps = [jnp.concatenate([tp, pad], axis=-1) for tp in taps]
    q = jnp.concatenate(taps, axis=-1)
    if form in ("flatbf", "dt4bf"):
        q = q.astype(jnp.bfloat16)
    if form == "hw12":
        return q
    flat = q.reshape(-1, q.shape[-1])
    if form in ("flat", "flat16", "flatbf", "dt4", "dt4bf"):
        return flat
    if form == "t":
        return flat.T
    raise ValueError(f"unknown quad form: {form!r}")
