"""Prediction: constant-velocity forward propagation with process noise
(``mapPrediction``, ``include/dsp_dynamic.h:627-701``) and the zero-velocity
variant (``include/dsp_static.h:630-646``).

TPU deviation (documented): the reference shifts every particle by the
negated ego displacement (``dsp_dynamic.h:300,665-667``) because its grid is
ego-centric.  Our grid is world-aligned with a moving window (see
``geometry``), so ego motion moves no data; prediction only advances particles
by their own velocity.  Under the static model the positions are untouched
entirely -- the reference's static prediction (``dsp_static.h:640-646``) is
pure ego-compensation.

Behavioral quirk preserved: a particle receives velocity noise only when
``|vx*vy*vz| >= 1e-6`` (``dsp_dynamic.h:653-659``).  This exempts any
particle with a zero component -- in particular, with
``limit_motion_to_xy_plane`` every particle has vz == 0 after its first
prediction, so in-map velocity diffusion effectively happens only at birth.
Kept verbatim: it is what keeps the reference's static structure crisp.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import MapConfig


def propagate(particles, cfg: MapConfig, key: jax.Array, dt: jnp.ndarray):
    """Advance every valid particle one frame.  Returns the new pool."""
    valid = particles.valid

    if cfg.motion_model == "static":
        zeros = jnp.zeros_like(particles.vx)
        return dataclasses.replace(particles, vx=zeros, vy=zeros, vz=zeros)

    noise = (
        jax.random.normal(key, (3,) + particles.vx.shape, jnp.float32)
        * cfg.velocity_noise_std
    )
    keep_still = (
        jnp.abs(particles.vx * particles.vy * particles.vz) < 1e-6
    )  # dsp_dynamic.h:653
    jitter = valid & ~keep_still
    vx = jnp.where(jitter, particles.vx + noise[0], particles.vx)
    vy = jnp.where(jitter, particles.vy + noise[1], particles.vy)
    vz = jnp.where(jitter, particles.vz + noise[2], particles.vz)
    if cfg.limit_motion_to_xy_plane:
        vz = jnp.where(valid, 0.0, vz)  # dsp_dynamic.h:661-663

    px = jnp.where(valid, particles.px + vx * dt, particles.px)
    py = jnp.where(valid, particles.py + vy * dt, particles.py)
    pz = jnp.where(valid, particles.pz + vz * dt, particles.pz)
    return dataclasses.replace(
        particles, px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz
    )
