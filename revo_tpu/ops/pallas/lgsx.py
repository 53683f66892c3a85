"""The LGSX reduction as a Pallas kernel: 6x6 normal equations from
warped points + sampled DT gradients.

TPU-native replacement for lsd_slam::LGS6 (utils/LGSX.h:329-398): where the
reference accumulates rank-1 outer products 4 lanes at a time with SSE, this
kernel streams (BLOCK, ...) point blocks through VMEM, builds the 6-dof
Jacobian rows on the VPU (optimizer.cpp:216-228 derivation) and contracts
J^T W J on the MXU, accumulating (6, 6) + (6,) + scalar statistics across
the grid.  The bilinear DT sampling stays an XLA gather upstream (random
per-lane access does not map to TPU vector units); this kernel fuses
everything after it.

Used by solver.residual_system when OptimizerConfig.use_pallas_lgsx is set;
parity with the einsum path is exact to f32 accumulation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from revo_tpu.ops.pallas.vma import out_struct

_BLOCK = 2048


def _kernel(wxp_ref, grad_ref, rw_ref, out_a_ref, out_g_ref, out_s_ref):
    """Lane-major layout: inputs are (rows, BLOCK) with points on lanes —
    Mosaic's native vector shape; components live on sublanes."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_a_ref[:] = jnp.zeros_like(out_a_ref)
        out_g_ref[:] = jnp.zeros_like(out_g_ref)
        out_s_ref[:] = jnp.zeros_like(out_s_ref)

    px = wxp_ref[0:1, :]  # (1, BLOCK)
    py = wxp_ref[1:2, :]
    pz = wxp_ref[2:3, :]
    gx = grad_ref[0:1, :]  # fx * sampled gx
    gy = grad_ref[1:2, :]  # fy * sampled gy
    r = rw_ref[0:1, :]
    w = rw_ref[1:2, :]  # huber weight * good mask (0 on dead lanes)

    pz_safe = jnp.where(pz == 0, 1e-12, pz)
    iz = 1.0 / pz_safe
    iz2 = iz * iz
    J = jnp.concatenate(
        [
            iz * gx,
            iz * gy,
            (-px * iz2) * gx + (-py * iz2) * gy,
            (-px * py * iz2) * gx - (1.0 + py * py * iz2) * gy,
            (1.0 + px * px * iz2) * gx + (px * py * iz2) * gy,
            (-py * iz) * gx + (px * iz) * gy,
        ],
        axis=0,
    )  # (6, BLOCK)

    Jw = J * w  # broadcast over sublanes
    # A += Jw @ J^T: contract the point lanes on the MXU.
    out_a_ref[:] += jax.lax.dot_general(
        Jw, J, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_g_ref[:] += jnp.sum(Jw * r, axis=1, keepdims=True).reshape(1, 6)
    out_s_ref[:] += jnp.sum(w * r * r).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lgsx_reduce(
    wxp: jax.Array,
    grads: jax.Array,
    r: jax.Array,
    w: jax.Array,
    interpret: bool | None = None,
):
    """(P,3) warped pts, (P,2) fx/fy-scaled gradients, (P,) residuals,
    (P,) weights (0 = dead lane) -> (A (6,6), g (6,), sum w r^2).

    Unnormalized sums; the caller divides by the good count (LGSX.h
    ``finish``, :320-326).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = wxp.shape[0]
    # Pad to a block multiple with zero-weight lanes; transpose to
    # lane-major (components x points).
    pad = (-p) % _BLOCK
    if pad:
        wxp = jnp.concatenate([wxp, jnp.zeros((pad, 3), wxp.dtype)])
        grads = jnp.concatenate([grads, jnp.zeros((pad, 2), grads.dtype)])
        r = jnp.concatenate([r, jnp.zeros(pad, r.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    wxp_t = wxp.T  # (3, P)
    grads_t = grads.T  # (2, P)
    rw = jnp.stack([r, w], axis=0)  # (2, P)
    n_blocks = wxp_t.shape[1] // _BLOCK

    A, g, s = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(
            out_struct((6, 6), jnp.float32, wxp_t, grads_t, rw),
            out_struct((1, 6), jnp.float32, wxp_t, grads_t, rw),
            out_struct((1, 1), jnp.float32, wxp_t, grads_t, rw),
        ),
        out_specs=(
            pl.BlockSpec((6, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(wxp_t, grads_t, rw)
    return A, g[0], s[0, 0]
