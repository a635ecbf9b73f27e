"""Prognostic 6-category GFDL microphysics: the hydrometeors are
ADVECTED dycore tracers with falling-precipitation memory between
steps (the reference's in-dycore GFDL MP tracer set --
fv_core_nml `do_sat_adj: true` over sphum/liq_wat/ice_wat/rainwat/
snowwat/graupel, workflows/prognostic_c48_run/tests/
test_regression.py:133-200; scheme gfdl_cloud_microphys.F90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu import wrapper
from fv3net_tpu.constants import CP_AIR, GRAV

N, NZ, DT = 8, 12, 600.0

SPECIES = (
    "specific_humidity",
    "cloud_water_mixing_ratio",
    "cloud_ice_mixing_ratio",
    "rain_mixing_ratio",
    "snow_mixing_ratio",
    "graupel_mixing_ratio",
)


@pytest.fixture()
def model():
    wrapper.initialize(
        wrapper.ModelConfig(
            npx=N + 1, npz=NZ, physics_suite="gfs",
            microphysics_scheme="gfdl", prognostic_mp_tracers=True,
            do_radiation=False, hydrostatic=False, dt_atmos=DT,
            n_split=4, dtype="float64",
        )
    )
    return wrapper.get_model()


def test_six_tracers_advected(model):
    assert model.state.q.shape[0] == 6
    meta = wrapper.get_tracer_metadata()
    assert [meta[s]["fortran_name"] for s in SPECIES] == [
        "sphum", "liq_wat", "ice_wat", "rainwat", "snowwat",
        "graupel",
    ]
    # seed a rain blob + a wind so transport moves it; dynamics-only
    model.config.physics_suite = "none"
    rng = np.random.RandomState(0)
    model.state = model.state._replace(
        q=model.state.q.at[3, :, 5].set(1e-3),
        u=model.state.u + jnp.asarray(
            5.0 + 0.1 * rng.randn(*model.state.u.shape)
        ),
    )
    area = model.area[:, None]  # [6, 1, n, n]
    q3_before = np.asarray(model.state.q[3])
    col_before = (
        np.asarray(model.state.q[3] * model.state.delp) * area
    ).sum()
    wrapper.step_dynamics()
    q3 = np.asarray(model.state.q[3])
    col_after = (
        np.asarray(model.state.q[3] * model.state.delp) * area
    ).sum()
    # the species moved (advection) and its mass is conserved
    assert np.abs(q3 - q3_before).max() > 1e-7
    np.testing.assert_allclose(col_after, col_before, rtol=1e-8)


def test_column_water_conservation_with_physics(model):
    """Total water (vapor + all 5 condensate species + accumulated
    surface precip) is conserved through a full coupled step with the
    GFDL scheme active."""
    mdl = model
    # moist unstable-ish column so every process engages
    rng = np.random.RandomState(1)
    q = mdl.state.q
    q = q.at[0].set(4e-3 + 1e-3 * rng.rand(6, NZ, N, N))
    q = q.at[1].set(2e-3 * rng.rand(6, NZ, N, N))
    q = q.at[2, :, :4].set(5e-4)
    q = q.at[3, :, 6:].set(3e-4)
    mdl.state = mdl.state._replace(q=q)

    def total_water():
        qtot = np.asarray(mdl.state.q[:6]).sum(axis=0)
        col = (qtot * np.asarray(mdl.state.delp) / GRAV).sum()
        precip_m = np.asarray(mdl.total_precip).sum()
        # total_precip is meters of liquid: 1 m = 1000 kg/m^2
        return col + 1000.0 * precip_m

    from fv3net_tpu.constants import LATENT_HEAT_VAPORIZATION

    w0 = total_water()
    wrapper.step_pre_radiation()
    wrapper.step_radiation()
    wrapper.step_post_radiation_physics()
    wrapper.apply_physics()
    # surface evaporation is a physical source: the budget closes as
    # water_after = water_before + integral(latent-heat flux)/Lv
    evap = (
        np.asarray(
            mdl._physics_diags["latent_heat_flux"]
        ).sum()
        / LATENT_HEAT_VAPORIZATION
        * DT
    )
    w1 = total_water()
    np.testing.assert_allclose(w1, w0 + evap, rtol=2e-6)


def test_falling_precipitation_memory(model):
    """Rain seeded aloft at step N reaches the surface at step N+k:
    the diagnostic-species r4 scheme rained everything out in one
    step; the prognostic scheme must carry falling mass in the rain
    tracer across steps."""
    mdl = model
    # dry atmosphere + rain blob near the top; kill other processes
    q = jnp.zeros_like(mdl.state.q)
    q = q.at[3, :, 2].set(2e-3)  # rain at level 2 of 12
    mdl.state = mdl.state._replace(q=q)
    import dataclasses

    mdl.gfs_config = dataclasses.replace(
        mdl.gfs_config,
        do_convection=False, do_shallow_convection=False,
        do_pbl=False, do_surface=False,
    )
    precip_per_step = []
    rain_in_air = []
    for _ in range(6):
        wrapper.apply_physics()
        precip_per_step.append(float(np.asarray(mdl.precip_rate).mean()))
        rain_in_air.append(
            float(np.asarray(mdl.state.q[3]).max())
        )
    # step 1 must NOT rain everything out: rain remains aloft after
    # the first step and the surface keeps receiving precip later
    assert rain_in_air[0] > 1e-5, "no falling-precip memory"
    assert precip_per_step[1] > 0.0
    # total eventually reaches the surface (water budget closes)
    assert sum(precip_per_step) > 0.0
    assert rain_in_air[-1] < rain_in_air[0]


def test_delinearized_collection_bounded():
    """The exponential collection form is bounded by the available
    condensate for ANY dt (the linearized form needed a min())."""
    from fv3net_tpu.physics.gfdl_mp import gfdl_cloud_microphysics

    shp = (1, 4, 2, 2)
    t = jnp.full(shp, 280.0)
    qv = jnp.full(shp, 1e-3)
    ql = jnp.full(shp, 2e-3)
    qr = jnp.full(shp, 5.0)  # absurd collector
    z = jnp.zeros(shp)
    p = jnp.full(shp, 8e4)
    delp = jnp.full(shp, 200.0)
    dz = jnp.full(shp, -500.0)
    state, _ = gfdl_cloud_microphysics(
        t, qv, ql, z, qr, z, z, p, delp, dz, 36000.0
    )
    for k, v in state.items():
        assert bool(jnp.isfinite(v).all()), k
        if k != "air_temperature":
            assert bool((v >= -1e-12).all()), k
