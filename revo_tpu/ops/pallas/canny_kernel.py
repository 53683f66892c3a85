"""Canny as two Pallas kernels: (1) Sobel + magnitude + sector NMS + double
threshold, (2) the hysteresis fixpoint — each VMEM-resident.

The XLA composition spends ~4.6 ms/frame at 640x480 across many small
kernels with HBM round trips.  A single monolithic kernel exceeds the 16 MB
VMEM budget (the NMS stage and the hysteresis loop each need several whole
-image f32 temporaries), so the stage boundary doubles as the VMEM budget
split.  Semantics are identical to ops.canny (itself OpenCV-exact): the
caller passes REFLECT_101-padded gray so border Sobel matches cv2, and NMS
neighbor magnitudes are zero outside the image like OpenCV's zero border.

Hardware notes (measured on v5e):
- 3x faster than the XLA composition (1.8 vs 5.4 ms) and *closer* to OpenCV
  (30 vs 569 differing pixels at 640x480): the platform forces
  --xla_allow_excess_precision which perturbs XLA's float compares, while
  Mosaic stays strict f32.
- Mosaic miscompiles a roll applied to an already-rolled/offset-layout
  value: Sobel uses single-level shifts of the input only, and the
  magnitude round-trips through a scratch ref before the NMS shifts.
- Batching goes through a custom_vmap rule onto a grid-over-batch variant
  (a plain vmap would fuse the batch into one VMEM block and OOM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revo_tpu.ops.pallas.vma import out_struct

from revo_tpu.ops.pallas.hysteresis import _shift2d, _run_batched

_TAN22 = 0.4142135623730950488


def _nms_core(gp, mag_ref, low_sq, high_sq):
    """Shared NMS math on a (h+2, w+2) padded-gray value; returns
    (cand, strong) f32 (h, w)."""

    # All mask logic in f32 (Mosaic rejects wide i1 vector selects), written
    # for minimal liveness: each whole-image f32 is 1.2 MB of VMEM.
    def f(c):
        return jnp.where(c, 1.0, 0.0)

    # Sobel from single-level shifts of the input only (see module note).
    gx = (
        (_shift2d(gp, -1, 1) + 2.0 * _shift2d(gp, 0, 1) + _shift2d(gp, 1, 1))
        - (_shift2d(gp, -1, -1) + 2.0 * _shift2d(gp, 0, -1)
           + _shift2d(gp, 1, -1))
    )[1:-1, 1:-1]
    gy = (
        (_shift2d(gp, 1, -1) + 2.0 * _shift2d(gp, 1, 0) + _shift2d(gp, 1, 1))
        - (_shift2d(gp, -1, -1) + 2.0 * _shift2d(gp, -1, 0)
           + _shift2d(gp, -1, 1))
    )[1:-1, 1:-1]

    # Round-trip mag through a scratch ref: the interior slice above gives
    # gx/gy an offset layout, and rolls on offset layouts miscompile;
    # storing + reloading resets the layout.
    mag_ref[:] = gx * gx + gy * gy
    mag = mag_ref[:]
    # One f32 sector-code array instead of three masks (VMEM liveness):
    # 0 = horizontal, 1 = vertical, 2 = diagonal "\", 3 = diagonal "/".
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    sec = jnp.where(
        ay < ax * _TAN22,
        0.0,
        jnp.where(
            ay > ax * (_TAN22 + 2.0),
            1.0,
            jnp.where((gx * gy) >= 0, 2.0, 3.0),
        ),
    )

    # Accumulate the NMS keep mask one sector at a time so at most two
    # shifted-magnitude temporaries are live at once.
    keep = f(sec == 0.0) * (
        f(mag > _shift2d(mag, 0, -1)) * f(mag >= _shift2d(mag, 0, 1))
    )
    keep = keep + f(sec == 1.0) * (
        f(mag > _shift2d(mag, -1, 0)) * f(mag >= _shift2d(mag, 1, 0))
    )
    keep = keep + f(sec == 2.0) * (
        f(mag > _shift2d(mag, -1, -1)) * f(mag > _shift2d(mag, 1, 1))
    )
    keep = keep + f(sec == 3.0) * (
        f(mag > _shift2d(mag, -1, 1)) * f(mag > _shift2d(mag, 1, -1))
    )

    cand = keep * f(mag > low_sq)
    return cand, cand * f(mag > high_sq)


def _nms_kernel(gray_pad_ref, cand_ref, strong_ref, mag_ref, *, low_sq,
                high_sq):
    cand, strong = _nms_core(gray_pad_ref[0], mag_ref, low_sq, high_sq)
    cand_ref[0] = cand
    strong_ref[0] = strong


def _nms_kernel2d(gray_pad_ref, cand_ref, strong_ref, mag_ref, *, low_sq,
                  high_sq):
    cand, strong = _nms_core(gray_pad_ref[:], mag_ref, low_sq, high_sq)
    cand_ref[:] = cand
    strong_ref[:] = strong


def _full_kernel2d(gray_pad_ref, out_ref, mag_ref, *, low_sq, high_sq,
                   max_iters):
    """NMS + hysteresis in ONE kernel (single-image path): per-call launch
    overhead dominates on this platform, so fewer kernels beats smaller
    kernels once vmem_limit_bytes is raised past the 16 MB default."""
    from revo_tpu.ops.pallas.hysteresis import _fixpoint

    cand, strong = _nms_core(gray_pad_ref[:], mag_ref, low_sq, high_sq)
    out_ref[:] = _fixpoint(cand, strong, max_iters)


def _canny_single(gp: jax.Array, low_sq: float, high_sq: float) -> jax.Array:
    interpret = jax.default_backend() != "tpu"
    hp, wp = gp.shape
    h, w = hp - 2, wp - 2
    return pl.pallas_call(
        functools.partial(
            _full_kernel2d, low_sq=low_sq, high_sq=high_sq, max_iters=h + w
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=out_struct((h, w), jnp.float32, gp),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(gp)


def _nms_batched(gp_b: jax.Array, low_sq: float, high_sq: float):
    """(B, h+2, w+2) padded gray -> (cand, strong) (B, h, w) f32."""
    interpret = jax.default_backend() != "tpu"
    b, hp, wp = gp_b.shape
    h, w = hp - 2, wp - 2
    if b == 1:
        cand, strong = pl.pallas_call(
            functools.partial(_nms_kernel2d, low_sq=low_sq, high_sq=high_sq),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=(
                out_struct((h, w), jnp.float32, gp_b),
                out_struct((h, w), jnp.float32, gp_b),
            ),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(gp_b[0])
        return cand[None], strong[None]
    return pl.pallas_call(
        functools.partial(_nms_kernel, low_sq=low_sq, high_sq=high_sq),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            out_struct((b, h, w), jnp.float32, gp_b),
            out_struct((b, h, w), jnp.float32, gp_b),
        ),
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(gp_b)


def _canny_batched(gray_b: jax.Array, low: float, high: float) -> jax.Array:
    gp = jnp.pad(
        gray_b.astype(jnp.float32), ((0, 0), (1, 1), (1, 1)), mode="reflect"
    )
    if gray_b.shape[0] == 1:
        return _canny_single(gp[0], low * low, high * high)[None]
    cand, strong = _nms_batched(gp, low * low, high * high)
    return _run_batched(cand, strong)


def _make_canny(low: float, high: float):
    @jax.custom_batching.custom_vmap
    def canny_f32(gray: jax.Array) -> jax.Array:
        return _canny_batched(gray[None], low, high)[0]

    @canny_f32.def_vmap
    def _rule(axis_size, in_batched, gray):
        if not in_batched[0]:
            gray = jnp.broadcast_to(gray, (axis_size,) + gray.shape)
        return _canny_batched(gray, low, high), True

    return canny_f32


@functools.lru_cache(maxsize=16)
def _cached_canny(low: float, high: float):
    return _make_canny(low, high)


def canny_pallas(
    gray: jax.Array,
    threshold1: float = 150.0,
    threshold2: float = 100.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in Pallas replacement for ops.canny (bool (H, W) edges)."""
    del interpret  # resolved per-call from the backend
    low = float(min(threshold1, threshold2))
    high = float(max(threshold1, threshold2))
    return _cached_canny(low, high)(gray) > 0.5
