"""Tests of the JAX GFS-style physics suite (physics/gfs.py).

Mirrors the reference's physics-validation style: conservation checks
and physically-shaped responses (SURVEY 4.6-4.7: mass conservation
asserts, port validation against known behavior).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fv3net_tpu.constants import CP_AIR, GRAV, LATENT_HEAT_VAPORIZATION
from fv3net_tpu.physics.gfs import (
    GFSPhysicsConfig,
    betts_miller,
    diffuse_column,
    gfs_physics_step,
    gscond,
    precpd,
    pressure_fields,
    qsat,
    tridiagonal_solve,
)

NZ, N = 16, 6
PTOP = 300.0


def _column_state(t_sfc=300.0, rh=0.5, seed=0):
    rng = np.random.RandomState(seed)
    pe1 = np.linspace(PTOP, 1.0e5, NZ + 1)
    delp = np.broadcast_to(np.diff(pe1)[:, None, None],
                           (6, NZ, N, N)).copy()
    pe, p = pressure_fields(jnp.asarray(delp, jnp.float32), PTOP)
    # stable-ish lapse
    t = t_sfc * (np.asarray(p) / 1.0e5) ** 0.19
    t = t + rng.uniform(-0.5, 0.5, t.shape)
    qv = rh * np.asarray(qsat(jnp.asarray(t, jnp.float32), p))
    qc = np.zeros_like(qv)
    return (
        jnp.asarray(t, jnp.float32),
        jnp.asarray(qv, jnp.float32),
        jnp.asarray(qc, jnp.float32),
        jnp.asarray(delp, jnp.float32),
        p,
    )


def test_tridiagonal_solve_matches_dense():
    rng = np.random.RandomState(1)
    nz = 12
    a = rng.uniform(-1, 0, (2, nz, 3, 3))
    c = rng.uniform(-1, 0, (2, nz, 3, 3))
    b = 2.0 + np.abs(a) + np.abs(c)  # diagonally dominant
    d = rng.uniform(-1, 1, (2, nz, 3, 3))
    x = np.asarray(
        tridiagonal_solve(*(jnp.asarray(v) for v in (a, b, c, d)))
    )
    for i in range(2):
        for jy in range(3):
            for jx in range(3):
                m = (
                    np.diag(b[i, :, jy, jx])
                    + np.diag(a[i, 1:, jy, jx], -1)
                    + np.diag(c[i, :-1, jy, jx], 1)
                )
                ref = np.linalg.solve(m, d[i, :, jy, jx])
                np.testing.assert_allclose(
                    x[i, :, jy, jx], ref, rtol=2e-5, atol=2e-6
                )


def test_diffusion_conserves_without_surface_flux():
    t, qv, qc, delp, p = _column_state()
    mass = delp / GRAV
    g_if = jnp.full_like(t[:, :-1], 0.05)
    zero = jnp.zeros_like(t[:, 0])
    x = qv
    x2 = diffuse_column(x, mass, g_if, 900.0, zero, zero)
    col0 = np.asarray((x * mass).sum(axis=1))
    col1 = np.asarray((x2 * mass).sum(axis=1))
    np.testing.assert_allclose(col1, col0, rtol=1e-5)
    # mixing reduces variance
    assert float(jnp.var(x2)) <= float(jnp.var(x)) + 1e-12


def test_diffusion_surface_flux_warms_cold_column():
    t, qv, qc, delp, p = _column_state(t_sfc=280.0)
    mass = delp / GRAV
    g_if = jnp.full_like(t[:, :-1], 0.05)
    sfc_g = jnp.full_like(t[:, 0], 0.02)
    t_sfc_val = jnp.full_like(t[:, 0], 400.0) * CP_AIR  # hot surface, s units
    s = CP_AIR * t
    s2 = diffuse_column(s, mass, g_if, 900.0, sfc_g, t_sfc_val)
    # heat enters at the bottom
    assert float(s2[:, -1].mean()) > float(s[:, -1].mean())
    # implied surface flux equals column energy gain
    gain = np.asarray(((s2 - s) * mass).sum(axis=1))
    flux = np.asarray(sfc_g * (t_sfc_val - s2[:, -1]) * 900.0)
    np.testing.assert_allclose(gain, flux, rtol=1e-4, atol=1e-3)


def test_gscond_conserves_moist_enthalpy_and_water():
    t, qv, qc, delp, p = _column_state(rh=1.2)  # supersaturated
    t2, qv2, qc2 = gscond(t, qv, qc, p, 900.0)
    np.testing.assert_allclose(
        np.asarray(qv2 + qc2), np.asarray(qv + qc), atol=1e-7
    )
    h0 = np.asarray(CP_AIR * t + LATENT_HEAT_VAPORIZATION * qv)
    h1 = np.asarray(CP_AIR * t2 + LATENT_HEAT_VAPORIZATION * qv2)
    np.testing.assert_allclose(h1, h0, rtol=1e-5)
    assert float((qc2 - qc).sum()) > 0  # condensation happened
    assert float((t2 - t).mean()) > 0  # latent heating


def test_precpd_water_budget_closes():
    t, qv, qc, delp, p = _column_state(rh=0.4)
    qc = qc + 1e-3  # cloud everywhere
    cfg = GFSPhysicsConfig()
    t2, qv2, qc2, precip = precpd(t, qv, qc, p, delp, 900.0, cfg)
    mass = np.asarray(delp) / GRAV
    col0 = ((np.asarray(qv) + np.asarray(qc)) * mass).sum(axis=1)
    col1 = ((np.asarray(qv2) + np.asarray(qc2)) * mass).sum(axis=1)
    np.testing.assert_allclose(
        col0 - col1, np.asarray(precip), rtol=1e-4, atol=1e-7
    )
    assert (np.asarray(precip) >= 0).all()
    # some rain evaporated into the dry column
    assert float((qv2 - qv).sum()) > 0


def test_betts_miller_conserves_enthalpy_when_active():
    t, qv, qc, delp, p = _column_state(t_sfc=305.0, rh=0.95)
    # make the sounding convectively unstable: warm+moisten the bottom
    t = t.at[:, -1].add(5.0)
    qv = qv.at[:, -1].set(0.9 * qsat(t[:, -1], p[:, -1]))
    cfg = GFSPhysicsConfig()
    t2, qv2, precip = betts_miller(t, qv, p, delp, 900.0, cfg)
    mass = np.asarray(delp) / GRAV
    dh = (
        (CP_AIR * (np.asarray(t2) - np.asarray(t))
         + LATENT_HEAT_VAPORIZATION * (np.asarray(qv2) - np.asarray(qv)))
        * mass
    ).sum(axis=1)
    # column enthalpy change balances precip latent heat release:
    # cp dT + Lv dq integrates to ~0 because the removed vapor's latent
    # heat stays in the column as warming
    np.testing.assert_allclose(dh, 0.0, atol=2.0)
    assert (np.asarray(precip) >= 0).all()


def test_full_suite_runs_and_is_finite():
    t, qv, qc, delp, p = _column_state(rh=0.8)
    u = jnp.zeros((6, NZ, N + 1, N), jnp.float32) + 5.0
    v = jnp.zeros((6, NZ, N, N + 1), jnp.float32)
    tsfc = jnp.full((6, N, N), 302.0, jnp.float32)
    out, diags = gfs_physics_step(
        t, qv, qc, u, v, delp, tsfc,
        jnp.asarray(PTOP, jnp.float32), 900.0,
    )
    for k, vv in {**out, **diags}.items():
        assert np.isfinite(np.asarray(vv)).all(), k
    assert float(diags["sensible_heat_flux"].mean()) != 0.0
    assert float(diags["latent_heat_flux"].mean()) > 0.0
    assert float(diags["planetary_boundary_layer_height"].min()) > 0.0
    # warm ocean under neutral column -> surface evaporation adds
    # water to the COLUMN (the surface level itself may dry: shallow
    # convection mixes the added moisture upward since r4)
    from fv3net_tpu.constants import GRAV as _G

    col0 = float((qv * delp).sum(axis=1).mean()) / _G
    col1 = float(
        (out["specific_humidity"] * delp).sum(axis=1).mean()
    ) / _G
    precip = float(diags["total_precipitation"].mean())
    assert col1 + precip >= col0 - 1e-8


@pytest.mark.slow
def test_wrapper_gfs_suite_end_to_end():
    from fv3net_tpu import wrapper

    wrapper.initialize(
        wrapper.ModelConfig(
            npx=7, npz=12, physics_suite="gfs", do_radiation=True,
            dt_atmos=900.0,
        )
    )
    try:
        from fv3net_tpu.util.quantity import Quantity

        # moisten so physics has something to do
        st = wrapper.get_state(["specific_humidity"])
        qty = st["specific_humidity"]
        wrapper.set_state(
            {"specific_humidity": Quantity(
                qty.data + 0.005, qty.dims, qty.units)}
        )
        for _ in range(2):
            wrapper.step_dynamics()
            wrapper.step_pre_radiation()
            wrapper.step_radiation()
            wrapper.step_post_radiation_physics()
            wrapper.apply_physics()
        temp = wrapper.get_state(["air_temperature"])[
            "air_temperature"].data
        assert np.isfinite(temp).all()
        assert 150.0 < temp.mean() < 350.0
        flux = wrapper.get_diagnostic_by_name("sensible_heat_flux")
        assert np.isfinite(flux.data).all()
    finally:
        wrapper.cleanup()


@pytest.mark.slow
def test_wrapper_gfs_with_emulation_hooks():
    """The call_py_fort analogue: hooks see *_input / *_after_* keys and
    may substitute *_output (SURVEY 3.4)."""
    from fv3net_tpu import wrapper

    wrapper.initialize(
        wrapper.ModelConfig(
            npx=7, npz=12, physics_suite="gfs", do_radiation=False,
        )
    )
    try:
        model = wrapper.get_model()
        seen = {}

        def gscond_hook(state):
            seen["gscond_keys"] = sorted(state.keys())

        def micro_hook(state):
            seen["micro_keys"] = sorted(state.keys())
            # substitute: zero out precip
            state["total_precipitation_output"] = np.zeros_like(
                state["total_precipitation"]
            )

        stored = []

        def store_hook(state):
            stored.append(len(state))

        model.emulation_hooks = (gscond_hook, micro_hook, store_hook)
        wrapper.apply_physics()
        assert "air_temperature_input" in seen["gscond_keys"]
        assert "air_temperature_after_gscond" in seen["gscond_keys"]
        assert "air_temperature_after_precpd" in seen["micro_keys"]
        assert "total_precipitation" in seen["micro_keys"]
        assert stored  # store hook ran
    finally:
        wrapper.cleanup()
