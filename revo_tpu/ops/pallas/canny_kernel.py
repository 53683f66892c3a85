"""Canny as two Pallas kernels: (1) Sobel + magnitude + sector NMS + double
threshold, (2) the hysteresis fixpoint — each VMEM-resident.

The XLA composition spends ~4.6 ms/frame at 640x480 across many small
kernels with HBM round trips.  A single monolithic kernel exceeds the 16 MB
VMEM budget (the NMS stage and the hysteresis loop each need several whole
-image f32 temporaries), so the stage boundary doubles as the VMEM budget
split.  Semantics are identical to ops.canny (itself OpenCV-exact): the
caller passes REFLECT_101-padded gray so border Sobel matches cv2, and NMS
neighbor magnitudes are zero outside the image like OpenCV's zero border.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revo_tpu.ops.pallas.hysteresis import hysteresis_pallas

_TAN22 = 0.4142135623730950488


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-fill shift: out[y, x] = x[y + dy, x + dx] (roll + border zero)."""
    h, w = x.shape
    out = pltpu.roll(x, (-dy) % h, 0) if dy else x
    out = pltpu.roll(out, (-dx) % w, 1) if dx else out
    if dy:
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        out = jnp.where(
            (rows >= (h + min(-dy, 0))) | (rows < max(-dy, 0)), 0.0, out
        )
    if dx:
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out = jnp.where(
            (cols >= (w + min(-dx, 0))) | (cols < max(-dx, 0)), 0.0, out
        )
    return out


def _nms_kernel(
    gray_pad_ref, cand_ref, strong_ref, mag_ref, *, low_sq, high_sq
):
    gp = gray_pad_ref[:]  # (h+2, w+2) REFLECT_101-padded gray

    # All mask logic in f32 (Mosaic rejects wide i1 vector selects), written
    # for minimal liveness: each whole-image f32 is 1.2 MB of VMEM.
    def f(c):
        return jnp.where(c, 1.0, 0.0)

    # Sobel from single-level shifts of the input only: Mosaic miscompiles a
    # sublane roll applied to an already-rolled value (gy came out wrong on
    # hardware while gx was exact), so never compose rolls.
    gx = (
        (_shift(gp, -1, 1) + 2.0 * _shift(gp, 0, 1) + _shift(gp, 1, 1))
        - (_shift(gp, -1, -1) + 2.0 * _shift(gp, 0, -1) + _shift(gp, 1, -1))
    )[1:-1, 1:-1]
    gy = (
        (_shift(gp, 1, -1) + 2.0 * _shift(gp, 1, 0) + _shift(gp, 1, 1))
        - (_shift(gp, -1, -1) + 2.0 * _shift(gp, -1, 0) + _shift(gp, -1, 1))
    )[1:-1, 1:-1]

    # Round-trip mag through a scratch ref: the interior slice above gives
    # gx/gy an offset layout, and rolls on offset layouts miscompile (see
    # note on the Sobel shifts); storing + reloading resets the layout.
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
        f(mag > _shift(mag, 0, -1)) * f(mag >= _shift(mag, 0, 1))
    )
    keep = keep + f(sec == 1.0) * (
        f(mag > _shift(mag, -1, 0)) * f(mag >= _shift(mag, 1, 0))
    )
    keep = keep + f(sec == 2.0) * (
        f(mag > _shift(mag, -1, -1)) * f(mag > _shift(mag, 1, 1))
    )
    keep = keep + f(sec == 3.0) * (
        f(mag > _shift(mag, -1, 1)) * f(mag > _shift(mag, 1, -1))
    )

    cand = keep * f(mag > low_sq)
    cand_ref[:] = cand
    strong_ref[:] = cand * f(mag > high_sq)


@functools.partial(
    jax.jit, static_argnames=("threshold1", "threshold2", "interpret")
)
def canny_pallas(
    gray: jax.Array,
    threshold1: float = 150.0,
    threshold2: float = 100.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in Pallas replacement for ops.canny (bool (H, W) edges)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    low = float(min(threshold1, threshold2))
    high = float(max(threshold1, threshold2))
    h, w = gray.shape
    gp = jnp.pad(gray.astype(jnp.float32), 1, mode="reflect")
    cand, strong = pl.pallas_call(
        functools.partial(
            _nms_kernel, low_sq=low * low, high_sq=high * high
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(gp)
    return hysteresis_pallas(cand > 0.5, strong > 0.5, interpret=interpret)
