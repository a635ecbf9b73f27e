"""Hydrostatic dycore tests: balanced rest state, conservation, and
stability of a thermally-forced circulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fv3net_tpu.constants import KAPPA, REFERENCE_SURFACE_PRESSURE
from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.dycore.hydro import (
    DycoreState,
    hybrid_coefficients,
    make_dycore_stepper,
)


def make_rest_state(g, nz, ptop, theta0=300.0, ps=1.0e5, dtype=jnp.float64):
    n = g.n
    ak, bk = hybrid_coefficients(nz, ptop)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * ps
    delp = (pe[1:] - pe[:-1]) * np.ones((nz, n, n))
    delp = np.broadcast_to(delp, (6, nz, n, n)).copy()
    pt = np.full((6, nz, n, n), theta0)
    return DycoreState(
        jnp.asarray(delp, dtype),
        jnp.asarray(pt, dtype),
        jnp.zeros((6, nz, n + 1, n), dtype),
        jnp.zeros((6, nz, n, n + 1), dtype),
    )


@pytest.mark.slow
def test_uniform_theta_rest_state():
    """Uniform theta + flat terrain + uniform ps: exact discrete balance,
    the state must not move."""
    n, nz = 12, 8
    g = CubedSphereGrid.make(n, halo=3)
    run, m, (ak, bk) = make_dycore_stepper(
        g, nz, dt_atmos=600.0, k_split=1, n_split=4, dtype=jnp.float64
    )
    s = make_rest_state(g, nz, ptop=300.0)
    phis = jnp.zeros((6, n, n), jnp.float64)
    out = run(s, phis, 5)
    assert np.abs(np.asarray(out.u)).max() < 1e-8
    assert np.abs(np.asarray(out.v)).max() < 1e-8
    np.testing.assert_allclose(
        np.asarray(out.delp), np.asarray(s.delp), rtol=1e-12
    )


@pytest.mark.slow
def test_mass_and_theta_conservation_with_anomaly():
    """A localized warm anomaly drives a circulation; total mass and
    mass-weighted theta must be conserved exactly."""
    n, nz = 12, 8
    g = CubedSphereGrid.make(n, halo=3)
    run, m, (ak, bk) = make_dycore_stepper(
        g, nz, dt_atmos=450.0, k_split=2, n_split=4, dtype=jnp.float64
    )
    s = make_rest_state(g, nz, ptop=300.0)
    # warm anomaly on face 0
    c = g.centers_xyz[g.interior + (np.s_[:],)]
    d = np.arccos(np.clip(c[..., 0], -1, 1))  # distance from (1,0,0)
    bubble = 5.0 * np.exp(-((d / 0.3) ** 2))
    pt = np.asarray(s.pt)
    pt = pt + bubble[:, None, :, :] * np.exp(
        -(((np.arange(nz) - nz * 0.7) / 2.0) ** 2)
    ).reshape(1, nz, 1, 1)
    s = s._replace(pt=jnp.asarray(pt))
    phis = jnp.zeros((6, n, n), jnp.float64)

    area = g.area[g.interior][:, None]
    m0 = (np.asarray(s.delp) * area).sum()
    th0 = (np.asarray(s.pt) * np.asarray(s.delp) * area).sum()
    out = run(s, phis, 10)
    m1 = (np.asarray(out.delp) * area).sum()
    th1 = (np.asarray(out.pt) * np.asarray(out.delp) * area).sum()
    np.testing.assert_allclose(m1, m0, rtol=1e-12)
    np.testing.assert_allclose(th1, th0, rtol=1e-11)
    # circulation developed but bounded
    umax = np.abs(np.asarray(out.u)).max()
    assert 1e-4 < umax < 50.0, umax
    assert np.isfinite(np.asarray(out.pt)).all()


@pytest.mark.slow
def test_tracer_transport_conserves():
    n, nz = 12, 8
    g = CubedSphereGrid.make(n, halo=3)
    run, m, (ak, bk) = make_dycore_stepper(
        g, nz, dt_atmos=450.0, k_split=1, n_split=4, dtype=jnp.float64
    )
    s = make_rest_state(g, nz, ptop=300.0)
    c = g.centers_xyz[g.interior + (np.s_[:],)]
    d = np.arccos(np.clip(c[..., 1], -1, 1))
    blob = np.exp(-((d / 0.4) ** 2))
    q = np.broadcast_to(blob[:, None], (6, nz, n, n)).copy()
    s = s._replace(
        q=jnp.asarray(q[None]),
        pt=s.pt + 3.0 * jnp.asarray(blob)[:, None, :, :],
    )
    phis = jnp.zeros((6, n, n), jnp.float64)
    area = g.area[g.interior][:, None]
    tr0 = (np.asarray(s.q[0]) * np.asarray(s.delp) * area).sum()
    out = run(s, phis, 8)
    tr1 = (np.asarray(out.q[0]) * np.asarray(out.delp) * area).sum()
    np.testing.assert_allclose(tr1, tr0, rtol=1e-11)
    # positivity (iv=0 remap + monotone-ish transport)
    assert np.asarray(out.q[0]).min() > -1e-9
