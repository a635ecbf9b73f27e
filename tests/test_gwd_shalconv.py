"""Orographic gravity-wave drag + shallow convection (the remaining
GFS-suite phases of VERDICT r3 item 5 physics depth)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fv3net_tpu.constants import (
    CP_AIR,
    GRAV,
    LATENT_HEAT_VAPORIZATION as LV,
)
from fv3net_tpu.physics.gwd import (
    GWDConfig,
    gravity_wave_drag,
    shallow_convection,
)

NZ, N = 20, 3


def _atmos(seed=0, u0=15.0):
    rng = np.random.RandomState(seed)
    shape = (6, NZ, N, N)
    p1d = np.linspace(3e3, 1e5, NZ)
    p = np.broadcast_to(p1d[None, :, None, None], shape).copy()
    delp = np.broadcast_to(
        np.gradient(p1d)[None, :, None, None], shape
    ).copy()
    t = 300.0 - 55.0 * (1 - p / 1e5) + 0.1 * rng.randn(*shape)
    u = np.full(shape, u0) + 0.1 * rng.randn(*shape)
    v = 0.1 * rng.randn(*shape)
    f32 = np.float32
    return tuple(
        jnp.asarray(a, f32) for a in (u, v, t, p, delp)
    )


def test_gwd_zero_orography_is_noop():
    u, v, t, p, delp = _atmos()
    h = jnp.zeros((6, N, N), jnp.float32)
    du, dv, dg = gravity_wave_drag(u, v, t, p, delp, h, 900.0)
    assert float(jnp.abs(du).max()) == 0.0
    assert float(jnp.abs(dv).max()) == 0.0


def test_gwd_decelerates_and_conserves_momentum():
    u, v, t, p, delp = _atmos()
    h = jnp.full((6, N, N), 400.0, jnp.float32)  # mountainous
    dt = 900.0
    du, dv, dg = jax.jit(
        lambda *a: gravity_wave_drag(*a, dt)
    )(u, v, t, p, delp, h)
    # drag opposes the (eastward) flow and never reverses it
    u2 = np.asarray(u + du)
    assert float(np.asarray(du).sum()) < 0.0
    assert (u2 >= -1e-3).all()
    # column momentum change = -(surface stress - top stress) * dt
    dM = np.asarray((du * delp / GRAV).sum(axis=1)) / dt
    tau_net = np.asarray(dg["gwd_surface_stress"]) - np.asarray(
        dg["gwd_top_stress"]
    )
    # project: flow is nearly zonal, so |dM| ~ tau_net (before the
    # no-reversal limiter, which only weakens the drag)
    assert (np.abs(dM) <= tau_net * (1 + 1e-3) + 1e-10).all()
    assert (-dM > 0.25 * tau_net).any(), "drag must deposit stress"
    assert np.isfinite(np.asarray(dv)).all()


def test_gwd_magnitude_sane():
    """Deceleration stays well under the wind itself for typical
    mid-latitude mountain forcing."""
    u, v, t, p, delp = _atmos(u0=20.0)
    h = jnp.full((6, N, N), 300.0, jnp.float32)
    du, dv, _ = gravity_wave_drag(u, v, t, p, delp, h, 900.0)
    assert float(jnp.abs(du).max()) < 10.0


def test_shallow_convection_conserves_and_moistens_aloft():
    u, v, t, p, delp = _atmos(seed=3)
    qv = jnp.asarray(
        np.where(
            np.asarray(p) > 8.5e4, 0.016, 0.002
        ).astype(np.float32)
    )
    # warm, moist lowest level -> unstable
    t = t.at[:, -1].add(4.0)
    t2, qv2, dg = jax.jit(
        lambda *a: shallow_convection(*a, 900.0)
    )(t, qv, p, delp)
    w = np.asarray(delp) / GRAV
    # exact column water and moist-enthalpy conservation
    np.testing.assert_allclose(
        (np.asarray(qv2) * w).sum(1), (np.asarray(qv) * w).sum(1),
        rtol=1e-5,
    )
    h0 = ((CP_AIR * np.asarray(t) + LV * np.asarray(qv)) * w).sum(1)
    h1 = ((CP_AIR * np.asarray(t2) + LV * np.asarray(qv2)) * w).sum(1)
    np.testing.assert_allclose(h1, h0, rtol=1e-6)
    # moisture moved UP: the lowest level dried, a level above moistened
    dq = np.asarray(qv2 - qv)
    assert dq[:, -1].mean() < 0.0
    assert dq[:, -4].mean() > 0.0
    assert np.asarray(dg["shallow_convection_active"]).any()


def test_shallow_convection_stable_column_is_noop():
    u, v, t, p, delp = _atmos(seed=4)
    # dry adiabatically stable and dry everywhere: no trigger
    qv = jnp.full_like(t, 1e-4)
    t_stable = t + jnp.asarray(
        np.linspace(30, 0, NZ)[None, :, None, None], jnp.float32
    )
    t2, qv2, dg = shallow_convection(t_stable, qv, p, delp, 900.0)
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(t_stable), atol=1e-5
    )
