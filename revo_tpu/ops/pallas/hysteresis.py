"""Canny hysteresis as a single Pallas kernel.

The XLA formulation launches one fused dilation kernel per iteration with the
masks living in HBM; at 640x480 the fixpoint takes tens of iterations and the
launches + HBM traffic dominate Canny's cost (~4.6 ms of the frame budget).
Here the candidate and reachable masks are VMEM-resident for the whole
fixpoint: per while-iteration we apply UNROLL 3x3 binary dilations (shift +
max on the VPU, borders zeroed) and stop when the reachable count stops
growing — bit-identical to OpenCV's BFS hysteresis, like the XLA path.

Batching: a plain jax.vmap of a whole-image pallas_call fuses the batch into
ONE kernel block and blows the 16 MB VMEM budget; a custom_vmap rule routes
batched calls to a grid-over-batch variant (one image per grid step, VMEM
-safe at any batch size).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revo_tpu.ops.pallas.vma import out_struct

_UNROLL = 8


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-fill shift via roll + border zeroing (VPU-friendly).

    out[y, x] = x[y + dy, x + dx] with zeros outside.  pltpu.roll requires
    non-negative shifts; -k == size - k (circular), then borders are zeroed.
    """
    h, w = x.shape
    out = pltpu.roll(x, (-dy) % h, 0) if dy else x
    out = pltpu.roll(out, (-dx) % w, 1) if dx else out
    zero = jnp.asarray(0, out.dtype)  # keep the input dtype (int8 masks)
    if dy:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        out = jnp.where(
            (rows >= (h + min(-dy, 0))) | (rows < max(-dy, 0)), zero, out
        )
    if dx:
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = jnp.where(
            (cols >= (w + min(-dx, 0))) | (cols < max(-dx, 0)), zero, out
        )
    return out


def _dilate(x: jax.Array) -> jax.Array:
    """Separable 3x3 max: vertical then horizontal (6 shifts, not 8)."""
    m = jnp.maximum(x, jnp.maximum(_shift2d(x, -1, 0), _shift2d(x, 1, 0)))
    return jnp.maximum(
        m, jnp.maximum(_shift2d(m, 0, -1), _shift2d(m, 0, 1))
    )


def _fixpoint(cand, reach, max_iters):
    """Grow reach through cand to fixpoint.

    (Masks stay f32: Mosaic's rotate does not support sub-32-bit data, so
    an int8 variant — 4x lane density — is not currently compilable.)"""

    def cond(state):
        reach, prev, it = state
        return (jnp.sum(reach) != prev) & (it < max_iters)

    def body(state):
        reach, _, it = state
        prev = jnp.sum(reach)
        grown = reach
        for _ in range(_UNROLL):
            grown = jnp.maximum(grown, cand * _dilate(grown))
        return grown, prev, it + _UNROLL

    zero = jnp.sum(reach) * 0
    reach, _, _ = jax.lax.while_loop(
        cond, body, (reach, zero - 1.0, zero)
    )
    return reach


def _kernel2d(cand_ref, strong_ref, out_ref, *, max_iters: int):
    out_ref[:] = _fixpoint(cand_ref[:], strong_ref[:], max_iters)


def _kernel(cand_ref, strong_ref, out_ref, *, max_iters: int):
    out_ref[0] = _fixpoint(cand_ref[0], strong_ref[0], max_iters)


def _run_batched(cand_b: jax.Array, strong_b: jax.Array) -> jax.Array:
    """(B, H, W) f32 masks -> (B, H, W) f32; one image per grid step.

    B == 1 skips the grid machinery (measurably cheaper for the streaming
    single-frame path)."""
    interpret = jax.default_backend() != "tpu"
    b, h, w = cand_b.shape
    if b == 1:
        out = pl.pallas_call(
            functools.partial(_kernel2d, max_iters=h + w),
            out_shape=out_struct((h, w), jnp.float32, cand_b, strong_b),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(cand_b[0], strong_b[0])
        return out[None]
    return pl.pallas_call(
        functools.partial(_kernel, max_iters=h + w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_struct((b, h, w), jnp.float32, cand_b, strong_b),
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(cand_b, strong_b)


@jax.custom_batching.custom_vmap
def _hysteresis_f32(cand: jax.Array, strong: jax.Array) -> jax.Array:
    return _run_batched(cand[None], strong[None])[0]


@_hysteresis_f32.def_vmap
def _hysteresis_vmap_rule(axis_size, in_batched, cand, strong):
    if not in_batched[0]:
        cand = jnp.broadcast_to(cand, (axis_size,) + cand.shape)
    if not in_batched[1]:
        strong = jnp.broadcast_to(strong, (axis_size,) + strong.shape)
    return _run_batched(cand, strong), True


def hysteresis_pallas(
    cand: jax.Array, strong: jax.Array, interpret: bool | None = None
) -> jax.Array:
    """Grow ``strong`` through ``cand`` with 8-connectivity to fixpoint.

    Inputs bool (H, W); output bool.  Runs interpreted off-TPU so the CPU
    test suite exercises the same kernel; vmap-safe at any batch size.
    """
    del interpret  # resolved per-call from the backend
    out = _hysteresis_f32(
        cand.astype(jnp.float32), strong.astype(jnp.float32)
    )
    return out > 0.5
