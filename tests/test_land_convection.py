"""Column tests for the Noah-style LSM and the SAS-style mass-flux
deep convection (VERDICT r2 item 8): surface energy closure, soil
drying, snow accumulation; convective MSE conservation, moisture
budget closure, and triggering behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from fv3net_tpu.constants import (
    CP_AIR,
    GRAV,
    LATENT_HEAT_VAPORIZATION,
)
from fv3net_tpu.physics.convection import SASConfig, sas_mass_flux
from fv3net_tpu.physics.land import (
    DZ_SOIL,
    LandConfig,
    LandState,
    land_step,
)

LV = LATENT_HEAT_VAPORIZATION


def _land_inputs(shape=(2, 2), t1=295.0, q1=0.008, sw=600.0):
    return dict(
        t1=jnp.full(shape, t1),
        q1=jnp.full(shape, q1),
        p_sfc=jnp.full(shape, 1.0e5),
        wind1=jnp.full(shape, 4.0),
        sw_down=jnp.full(shape, sw),
        lw_down=jnp.full(shape, 350.0),
        precip=jnp.zeros(shape),
        ch=jnp.full(shape, 0.01),
    )


def test_land_surface_energy_closure():
    state = LandState.initial((2, 2), t0=288.0, smc0=0.25)
    dt = 600.0
    new, fx = land_step(state, dt=dt, **_land_inputs())
    # surface balance closes to the linearization error (a few %)
    resid = (
        fx["net_radiation_land"]
        - fx["sensible_heat_flux_land"]
        - fx["latent_heat_flux_land"]
        - fx["ground_heat_flux"]
    )
    scale = np.abs(np.asarray(fx["net_radiation_land"])).max() + 1.0
    assert np.abs(np.asarray(resid)).max() < 0.05 * scale
    # DISCRETE soil-column energy closure is exact for the implicit
    # solve: storage change == ground flux in - deep flux out
    cfg = LandConfig()
    storage = sum(
        cfg.soil_heat_capacity * DZ_SOIL[i]
        * np.asarray(new.stc[i] - state.stc[i]) / dt
        for i in range(4)
    )
    g_bot = 2.0 * cfg.soil_conductivity / DZ_SOIL[3] * (
        np.asarray(new.stc[3]) - cfg.t_deep
    )
    np.testing.assert_allclose(
        storage, np.asarray(fx["ground_heat_flux"]) - g_bot,
        rtol=5e-4, atol=5e-2,  # f32 roundoff in c*dz*dT/dt
    )


def test_land_warms_and_dries_under_strong_sun():
    state = LandState.initial((2, 2), t0=285.0, smc0=0.25)
    for _ in range(24):
        state, fx = land_step(state, dt=600.0, **_land_inputs(sw=800.0))
    assert float(state.tskin.mean()) > 285.0
    assert float(state.smc[0].mean()) < 0.25  # evapotranspiration
    assert float(fx["latent_heat_flux_land"].mean()) > 0.0
    # soil heat flows downward: top layer warmed above its start
    assert float(state.stc[0].mean()) > 285.0


def test_land_beta_shuts_off_evap_at_wilting_point():
    cfg = LandConfig()
    state = LandState.initial((1, 1), t0=300.0, smc0=cfg.smc_wilt / 2)
    _, fx = land_step(
        state, dt=600.0, cfg=cfg, **_land_inputs(shape=(1, 1))
    )
    assert float(fx["latent_heat_flux_land"].max()) == 0.0


def test_land_snow_accumulates_when_cold():
    inputs = _land_inputs(t1=263.0, sw=50.0)
    inputs["precip"] = jnp.full((2, 2), 1e-4)  # kg/m2/s
    state = LandState.initial((2, 2), t0=268.0)
    state, fx = land_step(state, dt=600.0, **inputs)
    assert float(state.snow.min()) > 0.0
    # snow caps the skin temperature at freezing
    assert float(state.tskin.max()) <= 273.16 + 1e-3


def _sounding(unstable=True, shape=(1, 1, 1)):
    """[1, nz, 1, 1] columns: surface-based instability when asked."""
    nz = 20
    pe = np.linspace(100e2, 1000e2, nz + 1)
    delp = np.diff(pe)
    p = 0.5 * (pe[1:] + pe[:-1])
    t = 300.0 * (p / 1000e2) ** 0.286  # dry adiabat (neutral)
    if unstable:
        t = t - 6.0 * (1 - p / 1000e2)  # cool aloft -> unstable
        qv = np.where(p > 800e2, 0.018, 0.002)  # moist boundary layer
    else:
        t = t + 30.0 * (1 - p / 1000e2)  # strong inversion
        qv = np.full_like(p, 1e-3)
    tile = lambda a: jnp.asarray(
        np.broadcast_to(
            a[None, :, None, None],
            (shape[0], a.shape[0]) + shape[1:],
        ).copy()
    )
    return (
        tile(t), tile(qv), tile(p),
        tile(pe.astype(float)), tile(delp),
    )


def test_sas_conserves_column_mse_and_water():
    t, qv, p, pe, delp = _sounding(unstable=True)
    dt = 900.0
    t2, qv2, precip = sas_mass_flux(t, qv, p, pe, delp, dt)
    assert float(precip.max()) > 0.0, "unstable column must precipitate"
    m = delp / GRAV
    mse0 = float(jnp.sum((CP_AIR * t + LV * qv) * m))
    mse1 = float(jnp.sum((CP_AIR * t2 + LV * qv2) * m))
    # MSE change only through the geopotential part of s (heights are
    # diagnosed, not transported) -- gate tightly relative to content
    assert abs(mse1 - mse0) / abs(mse0) < 2e-4
    # water budget: column water decrease == precipitation
    w0 = float(jnp.sum(qv * m))
    w1 = float(jnp.sum(qv2 * m))
    np.testing.assert_allclose(
        w0 - w1, float(precip.sum()) * dt, rtol=1e-5
    )
    assert float(qv2.min()) >= 0.0


def test_sas_quiet_on_stable_column():
    t, qv, p, pe, delp = _sounding(unstable=False)
    t2, qv2, precip = sas_mass_flux(t, qv, p, pe, delp, 900.0)
    assert float(precip.max()) == 0.0
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t))
    np.testing.assert_allclose(np.asarray(qv2), np.asarray(qv))


def test_sas_stabilizes_column():
    """Repeated application reduces the launch-layer MSE excess."""
    t, qv, p, pe, delp = _sounding(unstable=True)
    from fv3net_tpu.physics.gfs import qsat

    def instability(tt, qq):
        h = CP_AIR * tt + LV * qq
        hsat = CP_AIR * tt + LV * qsat(tt, p)
        return float((h[:, -1] - hsat[:, 5]).max())

    i0 = instability(t, qv)
    for _ in range(8):
        t, qv, _ = sas_mass_flux(t, qv, p, pe, delp, 900.0)
    assert instability(t, qv) < i0


def test_gfs_step_with_mass_flux_scheme():
    from fv3net_tpu.physics.gfs import GFSPhysicsConfig, gfs_physics_step

    n, nz = 6, 12
    rng = np.random.RandomState(0)
    pe = np.linspace(100e2, 1000e2, nz + 1)
    delp = jnp.asarray(
        np.broadcast_to(
            np.diff(pe)[None, :, None, None], (6, nz, n, n)
        ).copy()
    )
    p = 0.5 * (pe[1:] + pe[:-1])
    t = jnp.asarray(
        np.broadcast_to(
            (300.0 * (p / 1000e2) ** 0.286)[None, :, None, None],
            (6, nz, n, n),
        ) + rng.randn(6, nz, n, n)
    )
    qv = jnp.full((6, nz, n, n), 5e-3)
    qc = jnp.zeros((6, nz, n, n))
    u = jnp.zeros((6, nz, n + 1, n))
    v = jnp.zeros((6, nz, n, n + 1))
    tsfc = jnp.full((6, n, n), 302.0)
    cfg = GFSPhysicsConfig(convection_scheme="mass_flux")
    out, diags = gfs_physics_step(
        t, qv, qc, u, v, delp, tsfc, 100e2, 900.0, cfg
    )
    assert np.isfinite(np.asarray(out["air_temperature"])).all()
    assert float(diags["total_precipitation"].min()) >= 0.0
