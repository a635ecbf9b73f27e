"""SAS-style mass-flux deep convection.

The role of the GFS suite's simplified Arakawa-Schubert scheme
(reference: stepped by the Fortran physics driver inside
`apply_physics`, runtime/loop.py:470-514): an entraining updraft from
the level of maximum moist static energy, a CAPE-based cloud-base
mass-flux closure, compensating environmental subsidence in exact flux
form, and detrainment of the (saturated) updraft air at cloud top.

Conservation by construction (test-gated): the scheme is a mass
rearrangement plus condensation, so the column moist static energy
cp*T + L*q (mass-weighted) is conserved exactly -- condensed water
leaves as precipitation while its latent heat stays in the column.

All columns advance together: the vertical structure is two lax.scans
(upward parcel ascent, interface fluxes); everything else is
elementwise over [6, nz, n, n].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import CP_AIR, GRAV, LATENT_HEAT_VAPORIZATION, RDGAS

LV = LATENT_HEAT_VAPORIZATION


@dataclasses.dataclass(frozen=True)
class SASConfig:
    entrainment: float = 1.0e-4  # fractional entrainment (1/m)
    tau_sas: float = 3600.0  # CAPE relaxation timescale (s)
    cape_trigger: float = 100.0  # J/kg minimum CAPE to fire
    max_courant: float = 0.4  # cap on mb*dt*g/delp


def _mse(t, qv, z):
    return CP_AIR * t + GRAV * z + LV * qv


def _heights(t, qv, delp, pe):
    """Layer-mean geopotential heights (hydrostatic, surface z=0)."""
    tv = t * (1.0 + 0.608 * qv)
    dz = RDGAS * tv * delp / (GRAV * 0.5 * (pe[:, 1:] + pe[:, :-1]))
    below = jnp.cumsum(dz[:, ::-1], axis=1)[:, ::-1] - dz
    return below + 0.5 * dz


def sas_mass_flux(
    t, qv, p, pe, delp, dt: float,
    cfg: SASConfig = SASConfig(),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One deep-convection step.  Fields [6, nz, n, n] (k=0 is the model
    top, k=nz-1 the surface layer, matching the dycore).  Returns
    (t_new, qv_new, precip_rate [kg/m^2/s])."""
    from .gfs import qsat

    nz = t.shape[1]
    z = _heights(t, qv, delp, pe)
    h_env = _mse(t, qv, z)
    hsat_env = CP_AIR * t + GRAV * z + LV * qsat(t, p)

    # launch layer: maximum MSE in the lowest quarter of the column
    kb0 = 3 * nz // 4
    h_low = jnp.where(
        jnp.arange(nz)[None, :, None, None] >= kb0, h_env, -jnp.inf
    )
    kb = jnp.argmax(h_low, axis=1)  # [6, n, n]
    h_base = jnp.max(h_low, axis=1)
    q_base = jnp.take_along_axis(qv, kb[:, None], axis=1)[:, 0]

    # entraining ascent (bottom -> top): dh_u/dz = -eps*(h_u - h_env)
    def ascent(carry, xs):
        h_u, started = carry
        h_e, hs_e, dzk, k_idx, kb_b = xs
        start_here = k_idx == kb_b
        h_u = jnp.where(start_here, h_base, h_u)
        started = started | start_here
        ent = jnp.exp(-cfg.entrainment * dzk)
        h_next = h_e + (h_u - h_e) * ent
        h_u = jnp.where(started & (k_idx <= kb_b), h_next, h_u)
        buoyant = started & (h_u > hs_e)
        return (h_u, started), (h_u, buoyant)

    tv = t * (1.0 + 0.608 * qv)
    dz = RDGAS * tv * delp / (GRAV * 0.5 * (pe[:, 1:] + pe[:, :-1]))
    ks = jnp.arange(nz - 1, -1, -1)  # bottom -> top order
    xs = (
        jnp.moveaxis(h_env[:, ::-1], 1, 0),
        jnp.moveaxis(hsat_env[:, ::-1], 1, 0),
        jnp.moveaxis(dz[:, ::-1], 1, 0),
        ks[:, None, None, None] * jnp.ones_like(h_env[:, :1], dtype=jnp.int32)[:, 0][None],
        kb[None] * jnp.ones((nz, 1, 1, 1), jnp.int32),
    )
    init = (jnp.full(h_base.shape, -jnp.inf, h_env.dtype),
            jnp.zeros(h_base.shape, bool))
    (_, _), (h_u_rev, buoy_rev) = jax.lax.scan(ascent, init, xs)
    h_u = jnp.moveaxis(h_u_rev, 0, 1)[:, ::-1]
    buoyant = jnp.moveaxis(buoy_rev, 0, 1)[:, ::-1]

    # cloud top: highest buoyant level; CAPE from parcel-env MSE excess
    karr = jnp.arange(nz)[None, :, None, None]
    ktop = jnp.min(
        jnp.where(buoyant, karr, nz), axis=1
    )  # [6, n, n]; nz => no cloud
    active_col = (ktop < kb - 1) & (ktop < nz)
    in_cloud = (karr >= ktop[:, None]) & (karr <= kb[:, None])
    cape = jnp.sum(
        jnp.where(
            buoyant, (h_u - hsat_env) / (CP_AIR * t) * GRAV * dz, 0.0
        ),
        axis=1,
    )
    fire = active_col & (cape > cfg.cape_trigger)

    # closure: relax CAPE over tau -- mb scaled by CAPE, capped by the
    # thinnest in-cloud layer's Courant limit
    rho_b = jnp.take_along_axis(
        p / (RDGAS * tv), kb[:, None], axis=1
    )[:, 0]
    w_star = jnp.sqrt(2.0 * jnp.maximum(cape, 0.0))
    mb = rho_b * w_star * (dt / cfg.tau_sas)
    min_dp = jnp.min(
        jnp.where(in_cloud, delp, jnp.inf), axis=1
    )
    mb = jnp.minimum(mb, cfg.max_courant * min_dp / (GRAV * dt))
    mb = jnp.where(fire, mb, 0.0)  # [6, n, n]

    # compensating subsidence in exact flux form: between ktop and kb
    # the environment moves DOWN by mb; interface flux of X is
    # mb * X(layer above the interface).  Updraft transports base air
    # to the top layer (detrainment), closing the mass circuit.
    s_env = CP_AIR * t + GRAV * z
    mbk = mb[:, None]
    flux_mask = (karr >= ktop[:, None]) & (karr < kb[:, None])

    def sub_tend(x):
        # interface k+1/2 flux = mb * x[k] for ktop <= k < kb
        fl = jnp.where(flux_mask, mbk * x, 0.0)  # flux through bottom iface of layer k
        # layer k gains fl[k-1] (from above), loses fl[k]
        gain = jnp.concatenate(
            [jnp.zeros_like(fl[:, :1]), fl[:, :-1]], axis=1
        )
        return (gain - fl) * GRAV / delp

    dq_sub = sub_tend(qv)
    ds_sub = sub_tend(s_env)

    # updraft: removes mb of base-layer air, detrains saturated air
    # with the updraft's (entrained) MSE at the top layer
    base_sel = (karr == kb[:, None]).astype(t.dtype)
    top_sel = (karr == ktop[:, None]).astype(t.dtype)
    g_dp = GRAV / delp
    # draw from base
    dq_up = -mbk * q_base[:, None] * base_sel * g_dp
    ds_up = -mbk * jnp.take_along_axis(
        s_env, kb[:, None], axis=1
    ) * base_sel * g_dp
    # detrain at top: moisture at saturation of the top layer; the
    # leftover (q_base - q_det) falls as precipitation; MSE excess
    # (minus precip's Lv) heats via the dry static energy budget
    q_top_sat = jnp.take_along_axis(qsat(t, p), ktop[:, None] % nz,
                                    axis=1)[:, 0]
    q_det = jnp.minimum(q_base, q_top_sat)
    cond = jnp.maximum(q_base - q_det, 0.0)  # kg/kg condensed
    # conservation: the transported air is the (undiluted) base air --
    # the entraining h_u above only shapes the buoyancy/cloud-top test.
    # Detrained dry static energy s_det = h_base - LV*q_det makes the
    # column MSE budget close exactly: d(column MSE) = mb*(s_det +
    # LV*q_det - s_base - LV*q_base) = 0, with the condensate's latent
    # heat staying in the column while the water leaves as precip.
    s_det = h_base - LV * q_det
    dq_up = dq_up + mbk * q_det[:, None] * top_sel * g_dp
    ds_up = ds_up + mbk * s_det[:, None] * top_sel * g_dp

    qv_new = qv + (dq_sub + dq_up) * dt
    s_new = s_env + (ds_sub + ds_up) * dt
    t_new = (s_new - GRAV * z) / CP_AIR
    precip = mb * cond  # kg/m^2/s

    # floor humidity; return any clipped moisture's latent heat to T
    clipped = jnp.maximum(-qv_new, 0.0)
    qv_new = qv_new + clipped
    t_new = t_new - LV * clipped / CP_AIR
    return t_new, qv_new, precip
