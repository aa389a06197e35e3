"""Pallas TPU kernels for the measurement update's two dense pair passes
(``mapUpdate``, dsp_dynamic.h:704-793; XLA formulation ops/update.py).

Per pyramid row the update evaluates the Gaussian pair term
``g = const^3 * exp(-0.5 |x - z|^2 / sigma^2)`` between the row's dense-tier
particles ``[S_t]`` and its neighborhood's dense-tier points ``[CK]``, then
reduces over one side per pass:

* pass 1: ``C_partial[row, m] = sum_s w_s g(s, m)``,
* pass 2: ``sum_dense[row, s] = sum_m g(s, m) * cinv[row, m]``.

XLA materializes the ``[rows, S_t, CK]`` pair tensors in HBM (with
``lax.map`` chunking when they exceed the float budget) -- at 1-degree
resolution that is 58M pair terms per pass streamed through HBM plus the
chunk loop's dynamic-update-slices (~6 ms of the multi-neighbor frame,
docs/PERF.md).  Here each row-block's pair tile lives only in VMEM: HBM
traffic collapses to the inputs and outputs (~25 MB), and the exp/multiply
work runs at VPU speed.

Numerics: ``d2`` is computed as coordinate differences squared (the XLA
path uses the ``|a|^2+|b|^2-2ab`` matmul identity); both are exact up to
f32 rounding, so the shared tests assert ``allclose`` rather than
bit-equality.  Masking needs no special handling in-kernel: invalid slots
carry ``w = 0`` and invalid points carry ``cinv = 0``, and pass-1 garbage
columns are masked by ``obs.mask`` downstream -- identical to the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: reference standardNormalPDF constant (see ops/update.py)
_CONST3 = (1.0 / math.sqrt(math.pi)) ** 3


def _row_block(n_pyr: int, max_b: int = 32) -> int:
    """Largest divisor of ``n_pyr`` <= max_b that is a multiple of 8 (Mosaic
    requires the second-minor block dim divisible by 8 unless it spans the
    array); falls back to any divisor for tiny grids."""
    for b in range(max_b - max_b % 8, 0, -8):
        if n_pyr % b == 0:
            return b
    for b in range(min(max_b, n_pyr), 0, -1):
        if n_pyr % b == 0:
            return b
    return 1


def _d2(px, py, pz, qx, qy, qz):
    # operands arrive pre-scaled by 1/sigma (see _call) so sigma can be a
    # traced scalar (live setters) without entering the kernel
    ax = px[:, :, None] - qx[:, None, :]
    ay = py[:, :, None] - qy[:, None, :]
    az = pz[:, :, None] - qz[:, None, :]
    return ax * ax + ay * ay + az * az  # [B, S_t, CK]


def _pass1_kernel(px_ref, py_ref, pz_ref, w_ref, qx_ref, qy_ref, qz_ref,
                  out_ref):
    d2 = _d2(px_ref[...], py_ref[...], pz_ref[...],
             qx_ref[...], qy_ref[...], qz_ref[...])
    g = _CONST3 * jnp.exp(-0.5 * d2)
    out_ref[...] = jnp.sum(w_ref[...][:, :, None] * g, axis=1)  # [B, CK]


def _pass2_kernel(px_ref, py_ref, pz_ref, cinv_ref, qx_ref, qy_ref, qz_ref,
                  out_ref):
    d2 = _d2(px_ref[...], py_ref[...], pz_ref[...],
             qx_ref[...], qy_ref[...], qz_ref[...])
    g = _CONST3 * jnp.exp(-0.5 * d2)
    out_ref[...] = jnp.sum(g * cinv_ref[...][:, None, :], axis=2)  # [B, S_t]


def _call(kernel, pos, row_vec, nbr_pts, sigma, out_cols, interpret):
    """Shared driver: ``pos [n_pyr, S_t, 3]``, ``row_vec`` the per-slot
    (pass 1 weights) or per-point (pass 2 cinv) factor, ``nbr_pts
    [n_pyr, CK, 3]``; returns ``[n_pyr, out_cols]``.

    ``sigma`` may be a traced scalar: both coordinate sides are pre-scaled
    by ``1/sigma`` outside the kernel (XLA fuses the multiply into the
    producers), which computes the identical ``px/sigma - qx/sigma``
    difference the kernel previously formed in-VMEM."""
    n_pyr, s_t, _ = pos.shape
    ck = nbr_pts.shape[1]
    B = _row_block(n_pyr)
    grid = (n_pyr // B,)
    inv_sigma = 1.0 / sigma
    pos = pos * inv_sigma
    nbr_pts = nbr_pts * inv_sigma

    def spec(cols):
        return pl.BlockSpec((B, cols), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    operands = (
        pos[..., 0], pos[..., 1], pos[..., 2], row_vec,
        nbr_pts[..., 0], nbr_pts[..., 1], nbr_pts[..., 2],
    )
    in_cols = (s_t, s_t, s_t, row_vec.shape[1], ck, ck, ck)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(c) for c in in_cols],
        out_specs=spec(out_cols),
        out_shape=jax.ShapeDtypeStruct((n_pyr, out_cols), jnp.float32),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("interpret",))
def update_pass1(pos, w, nbr_pts, sigma, interpret: bool = False):
    """``C_partial[n_pyr, CK] = sum_s w[n_pyr, s] g(pos[n_pyr, s],
    nbr_pts[n_pyr, m])`` -- the dense x dense block of ops/update.py pass 1."""
    return _call(_pass1_kernel, pos, w, nbr_pts, sigma,
                 nbr_pts.shape[1], interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def update_pass2(pos, cinv, nbr_pts, sigma, interpret: bool = False):
    """``sum_dense[n_pyr, S_t] = sum_m g(pos, nbr_pts) * cinv[n_pyr, m]`` --
    the dense x dense block of ops/update.py pass 2."""
    return _call(_pass2_kernel, pos, cinv, nbr_pts, sigma,
                 pos.shape[1], interpret)
