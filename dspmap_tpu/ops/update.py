"""SMC-PHD measurement update -- the hot kernel (``mapUpdate``,
``include/dsp_dynamic.h:704-793``).

Math (reference semantics):

* pass 1: for each measurement z binned in pyramid i,
  ``C(z) = sum_{x in nbhd(i)} P_d * w_x * g(z|x) + (E_birth + kappa)``
  (``dsp_dynamic.h:709-739``),
* pass 2: every non-occluded in-FOV particle gets
  ``w *= (1 - P_d) + sum_{z in nbhd} P_d * g(z|x) / C(z)``
  (``dsp_dynamic.h:768-787``); occluded particles (ego range beyond the
  pyramid's max measured range + slack) are skipped (``dsp_dynamic.h:759-765``)
  -- note pass 1 has no occlusion check, faithfully kept.

``g(z|x)`` is the product of three axis-wise lookups of the reference's
standard-normal table (``dsp_dynamic.h:1282-1301``).  Two reference quirks are
preserved because they scale the absolute magnitudes of C and the birth
normalizer: the normalization constant is ``1/sqrt(2*(pi/2)) = 1/sqrt(pi)``
(not ``1/sqrt(2*pi)``; ``dsp_dynamic.h:1284``) and there is no ``1/sigma``
factor (``dsp_dynamic.h:1294-1301``).  Two are consciously dropped (both are
O(1e-21) effects): the table's 0.001-sigma quantization and the +-9.9-sigma
clamp -- we evaluate the exponential exactly.

TPU formulation: the particle-measurement coupling over the (2N+1)^2 pyramid
neighborhood becomes dense tiles.  Per pyramid tile, the pair term
``|x - z|^2 = |x|^2 + |z|^2 - 2 x.z`` puts the inner product on the MXU as a
batched ``[S_pyr, 3] @ [3, C*K]`` matmul; neighborhoods are 9 (or 25) shifted
copies of the ``[H, W, K]`` observation grid, and the pass-1 reduction
scatters back through the inverse shifts.  Work is chunked over pyramids with
``lax.map`` to bound the materialized pair tensor.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..config import MapConfig
from .fov import FovBinning
from .project import Observation

#: reference standardNormalPDF constant: 1/sqrt(2 * (pi/2)) (dsp_dynamic.h:1284)
REF_PDF_CONST = 1.0 / math.sqrt(math.pi)


def _neighbor_offsets(cfg: MapConfig):
    n = cfg.pyramid_neighbor_radius
    return [(dh, dv) for dh in range(-n, n + 1) for dv in range(-n, n + 1)]


def gather_neighbors(x: jnp.ndarray, cfg: MapConfig, fill) -> jnp.ndarray:
    """``[n_pyr, K, ...] -> [n_pyr, C*K, ...]``: concatenated per-cell copies
    of the (2N+1)^2 neighboring cells' entries, grid-clipped (the reference's
    per-pyramid neighbor lists, dsp_dynamic.h:1128-1147, as shifts)."""
    H, W = cfg.n_pyramids_h, cfg.n_pyramids_v
    n = cfg.pyramid_neighbor_radius
    K = x.shape[1]
    trailing = x.shape[2:]
    xg = x.reshape((H, W, K) + trailing)
    pad = [(n, n), (n, n), (0, 0)] + [(0, 0)] * len(trailing)
    padded = jnp.pad(xg, pad, constant_values=fill)
    parts = [
        padded[n + dh : n + dh + H, n + dv : n + dv + W]
        for dh, dv in _neighbor_offsets(cfg)
    ]
    out = jnp.stack(parts, axis=2)  # [H, W, C, K, ...]
    return out.reshape((H * W, len(parts) * K) + trailing)


def scatter_neighbor_sum(contrib: jnp.ndarray, cfg: MapConfig) -> jnp.ndarray:
    """Inverse of :func:`gather_neighbors` for additive reductions:
    ``contrib[n_pyr, C*K]`` holds partial sums computed *in* pyramid j for the
    points *of* its neighbor j+o; returns ``[n_pyr, K]`` totals per point."""
    H, W = cfg.n_pyramids_h, cfg.n_pyramids_v
    n = cfg.pyramid_neighbor_radius
    offsets = _neighbor_offsets(cfg)
    K = contrib.shape[1] // len(offsets)
    cg = contrib.reshape(H, W, len(offsets), K)
    total = jnp.zeros((H, W, K), contrib.dtype)
    for c, (dh, dv) in enumerate(offsets):
        shifted = jnp.pad(cg[:, :, c], ((n, n), (n, n), (0, 0)))[
            n - dh : n - dh + H, n - dv : n - dv + W
        ]
        total = total + shifted
    return total.reshape(H * W, K)


def _chunk(n_pyr: int, s_pyr: int, ck: int, budget_floats: int = 52_000_000) -> int:
    """Largest divisor of n_pyr whose pair tile fits the float budget."""
    target = max(1, budget_floats // max(s_pyr * ck, 1))
    best = 1
    for d in range(1, n_pyr + 1):
        if n_pyr % d == 0 and d <= target:
            best = d
    return best


def _pair_g(ppos, pts, sigma: float):
    """``g`` for one chunk: ppos [B, S, 3], pts [B, M, 3] -> [B, S, M]."""
    a = ppos / sigma
    b = pts / sigma
    d2 = (
        jnp.sum(a * a, axis=-1)[:, :, None]
        + jnp.sum(b * b, axis=-1)[:, None, :]
        - 2.0 * jnp.einsum("bsi,bmi->bsm", a, b, preferred_element_type=jnp.float32)
    )
    return (REF_PDF_CONST**3) * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def measurement_update(
    particles,
    fovbin: FovBinning,
    obs: Observation,
    cfg: MapConfig,
    expected_newborn: jnp.ndarray,
    update_time: jnp.ndarray,
):
    """Returns ``(new_particles, C[n_pyr, K], stats)``.

    ``C`` (the per-measurement clutter-plus-likelihood normalizer, stored by
    the reference inside ``point_cloud[i][j][3]``) feeds the birth step's
    normalization sum (``dsp_dynamic.h:798-805``).
    """
    S, V = particles.flags.shape
    n_pyr, K = cfg.n_pyramids, cfg.max_obs_points_per_pyramid
    s_pyr = cfg.pyramid_slots
    ck = cfg.neighbor_cells * K
    chunk = _chunk(n_pyr, s_pyr, ck)
    n_chunks = n_pyr // chunk

    nbr_pts = gather_neighbors(obs.points, cfg, 0.0)  # [n_pyr, CK, 3]
    nbr_mask = gather_neighbors(obs.mask, cfg, False)  # [n_pyr, CK]

    pw = fovbin.weight * fovbin.mask  # masked particle weights

    # ---- pass 1: C(z) --------------------------------------------------
    def pass1(args):
        ppos, w, pts = args
        g = _pair_g(ppos, pts, cfg.sigma_ob)  # [B, S, CK]
        return jnp.einsum(
            "bsm,bs->bm", g, w, preferred_element_type=jnp.float32
        )

    c_part = jax.lax.map(
        pass1,
        (
            fovbin.pos.reshape(n_chunks, chunk, s_pyr, 3),
            pw.reshape(n_chunks, chunk, s_pyr),
            nbr_pts.reshape(n_chunks, chunk, ck, 3),
        ),
    ).reshape(n_pyr, ck) * cfg.p_detection

    c_grid = scatter_neighbor_sum(c_part, cfg) + (expected_newborn + cfg.kappa)
    c_grid = jnp.where(obs.mask, c_grid, 1.0)  # masked cells: inert positive

    # ---- pass 2: weight factors ---------------------------------------
    nbr_cinv = jnp.where(nbr_mask, 1.0 / gather_neighbors(c_grid, cfg, 1.0), 0.0)

    def pass2(args):
        ppos, pts, cinv = args
        g = _pair_g(ppos, pts, cfg.sigma_ob)
        return jnp.einsum(
            "bsm,bm->bs", g, cinv, preferred_element_type=jnp.float32
        )

    sum_by_zk = jax.lax.map(
        pass2,
        (
            fovbin.pos.reshape(n_chunks, chunk, s_pyr, 3),
            nbr_pts.reshape(n_chunks, chunk, ck, 3),
            nbr_cinv.reshape(n_chunks, chunk, ck),
        ),
    ).reshape(n_pyr, s_pyr) * cfg.p_detection

    factor = (1.0 - cfg.p_detection) + sum_by_zk

    # Occlusion: skipped iff the particle's own pyramid has points AND the
    # particle sits beyond their max range + slack (dsp_dynamic.h:759-765).
    # A particle in an empty pyramid is still updated from neighbor cells.
    occluded = (obs.max_range[:, None] > 0.0) & (
        fovbin.rng > obs.max_range[:, None] + cfg.occlusion_slack
    )
    updated = fovbin.mask & ~occluded
    new_w = jnp.where(updated, fovbin.weight * factor, fovbin.weight)

    # ---- write back into the pool -------------------------------------
    slot = jnp.where(updated, fovbin.slot, S * V).ravel()
    weight = particles.weight.ravel().at[slot].set(new_w.ravel(), mode="drop")
    t = particles.t.ravel().at[slot].set(update_time, mode="drop")
    new_particles = dataclasses.replace(
        particles, weight=weight.reshape(S, V), t=t.reshape(S, V)
    )
    stats = {"updated_particles": jnp.sum(updated)}
    return new_particles, c_grid, stats
