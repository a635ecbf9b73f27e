"""Pallas TPU kernel equivalence vs the jnp reference implementations
(interpret mode on CPU; the real-chip parity check runs in tools/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fv3net_tpu.ops.advection import fv_tp_2d
from fv3net_tpu.ops.pallas_tp import fv_tp_2d_pallas


def _args(n=12, nz=5, h=3, seed=0):
    N = n + 2 * h
    rng = np.random.RandomState(seed)
    f32 = np.float32
    qx = jnp.asarray(rng.randn(6, nz, N, N).astype(f32))
    qy = jnp.asarray(rng.randn(6, nz, N, N).astype(f32))
    crx = jnp.asarray((0.2 * rng.randn(6, nz, N, N)).astype(f32))
    cry = jnp.asarray((0.2 * rng.randn(6, nz, N, N)).astype(f32))
    xfx = jnp.asarray(rng.randn(6, nz, N, N).astype(f32))
    yfx = jnp.asarray(rng.randn(6, nz, N, N).astype(f32))
    apx = jnp.asarray(
        (1.0 + 0.1 * rng.rand(6, 1, N, N)).astype(f32)
    )
    apy = jnp.asarray(
        (1.0 + 0.1 * rng.rand(6, 1, N, N)).astype(f32)
    )
    return qx, qy, crx, cry, xfx, yfx, apx, apy, h, n


@pytest.mark.parametrize("hord", [1, 5, 6, 8])
def test_fv_tp_2d_pallas_matches_jnp(hord):
    qx, qy, crx, cry, xfx, yfx, apx, apy, h, n = _args()
    fx_ref, fy_ref = fv_tp_2d(
        qx, qy, crx, cry, xfx, yfx, apx, apy, hord
    )
    fx, fy = fv_tp_2d_pallas(
        qx, qy, crx, cry, xfx, yfx, apx, apy, hord, interpret=True
    )
    # garbage near the array ends is cropped by callers: compare the
    # face-lattice region actually consumed (interior +/- halo-1)
    sl = np.s_[:, :, 2 : n + 2 * h - 2, 2 : n + 2 * h - 2]
    np.testing.assert_allclose(
        np.asarray(fx)[sl], np.asarray(fx_ref)[sl], rtol=1e-4,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fy)[sl], np.asarray(fy_ref)[sl], rtol=1e-4,
        atol=1e-3,
    )


def test_fv_tp_2d_pallas_odd_zblock():
    """nz not divisible by the z-block: real levels must still match."""
    qx, qy, crx, cry, xfx, yfx, apx, apy, h, n = _args(nz=7, seed=3)
    fx_ref, fy_ref = fv_tp_2d(
        qx, qy, crx, cry, xfx, yfx, apx, apy, 5
    )
    fx, fy = fv_tp_2d_pallas(
        qx, qy, crx, cry, xfx, yfx, apx, apy, 5, interpret=True
    )
    sl = np.s_[:, :, 2 : n + 2 * h - 2, 2 : n + 2 * h - 2]
    np.testing.assert_allclose(
        np.asarray(fx)[sl], np.asarray(fx_ref)[sl], rtol=1e-4,
        atol=1e-3,
    )


def test_fv_tp_2d_pallas_mass_weighted_area():
    """area*delp (full z extent) as the area argument — the pt/w
    transport form in dyn_substep."""
    qx, qy, crx, cry, xfx, yfx, apx, apy, h, n = _args(seed=5)
    rng = np.random.RandomState(7)
    dp = jnp.asarray(
        (100.0 + rng.rand(*qx.shape)).astype(np.float32)
    )
    fx_ref, fy_ref = fv_tp_2d(
        qx, qy, crx, cry, xfx, yfx, apx * dp, apy * dp, 5
    )
    fx, fy = fv_tp_2d_pallas(
        qx, qy, crx, cry, xfx, yfx, apx * dp, apy * dp, 5,
        interpret=True,
    )
    sl = np.s_[:, :, 2 : n + 2 * h - 2, 2 : n + 2 * h - 2]
    np.testing.assert_allclose(
        np.asarray(fx)[sl], np.asarray(fx_ref)[sl], rtol=1e-4,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(fy)[sl], np.asarray(fy_ref)[sl], rtol=1e-4,
        atol=1e-3,
    )


# ---------------------------------------------------------------------------
# sim1 semi-implicit vertical solver (ops/pallas_sim1.py)
# ---------------------------------------------------------------------------


def _sim1_args(n=8, nz=13, dtype=np.float32, seed=0):
    """Physically plausible columns (the solver's gas law needs
    dz < 0, dm > 0, pt > 0)."""
    from fv3net_tpu.constants import GRAV
    from fv3net_tpu.dycore.riemann import (
        hydrostatic_dz,
        layer_mean_pressure,
    )

    rng = np.random.RandomState(seed)
    ps, ptop = 1.0e5, 300.0
    pe1d = np.linspace(ptop, ps, nz + 1)
    pe = np.broadcast_to(
        pe1d[:, None, None], (nz + 1, n, n)
    ) * (1.0 + 0.01 * rng.rand(6, nz + 1, n, n))
    pe = np.sort(pe, axis=1)
    delp = pe[:, 1:] - pe[:, :-1]
    pt = 300.0 + 30.0 * rng.randn(6, nz, n, n)
    pt = np.clip(pt, 200.0, 400.0)
    dm = delp / GRAV
    pm = np.asarray(
        layer_mean_pressure(jnp.asarray(delp), jnp.asarray(pe))
    )
    dz = np.asarray(
        hydrostatic_dz(
            jnp.asarray(delp), jnp.asarray(pt), jnp.asarray(pe)
        )
    ) * (1.0 + 0.05 * rng.randn(6, nz, n, n))
    w = 2.0 * rng.randn(6, nz, n, n)
    ws = 0.5 * rng.randn(6, n, n)
    c = lambda x: jnp.asarray(x, dtype)  # noqa: E731
    return (
        c(dm), c(pt), c(dz), c(w), c(pe), c(pm), c(ws)
    )


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_sim1_pallas_matches_jnp(dtype):
    from fv3net_tpu.dycore.riemann import sim1_solver
    from fv3net_tpu.ops.pallas_sim1 import sim1_solver_pallas

    dm, pt, dz, w, pem, pm, ws = _sim1_args(dtype=dtype)
    dt = 150.0
    w_ref, dz_ref, ppe_ref = sim1_solver(
        dt, dm, pt, dz, w, pem, pm, ws
    )
    w2, dz2, ppe = sim1_solver_pallas(
        dt, dm, pt, dz, w, pem, pm, ws, interpret=True
    )
    rtol = 1e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(w_ref), rtol=rtol, atol=rtol * 10
    )
    np.testing.assert_allclose(
        np.asarray(dz2), np.asarray(dz_ref), rtol=rtol,
        atol=rtol * 100,
    )
    np.testing.assert_allclose(
        np.asarray(ppe), np.asarray(ppe_ref), rtol=1e-4,
        atol=np.abs(np.asarray(ppe_ref)).max() * rtol * 10,
    )


def test_sim1_pallas_odd_rows():
    """ny not divisible by 8 exercises the BY fallback."""
    from fv3net_tpu.dycore.riemann import sim1_solver
    from fv3net_tpu.ops.pallas_sim1 import sim1_solver_pallas

    dm, pt, dz, w, pem, pm, ws = _sim1_args(n=6, seed=2)
    w_ref, dz_ref, _ = sim1_solver(
        150.0, dm, pt, dz, w, pem, pm, ws
    )
    w2, dz2, _ = sim1_solver_pallas(
        150.0, dm, pt, dz, w, pem, pm, ws, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(w2), np.asarray(w_ref), rtol=1e-5, atol=1e-4
    )


# ---------------------------------------------------------------------------
# vertical remap (ops/pallas_remap.py)
# ---------------------------------------------------------------------------


def _remap_args(n=8, km=13, kn=13, seed=0, stag=(0, 0)):
    rng = np.random.RandomState(seed)
    ny, nx = n + stag[0], n + stag[1]
    ps, ptop = 1.0e5, 300.0
    pe1 = np.sort(
        np.broadcast_to(
            np.linspace(ptop, ps, km + 1)[:, None, None],
            (km + 1, ny, nx),
        )
        * (1.0 + 0.02 * rng.rand(6, km + 1, ny, nx)),
        axis=1,
    )
    # target grid: same endpoints, redistributed interiors (the
    # Lagrangian->Eulerian situation)
    w = np.sort(rng.rand(6, kn + 1, ny, nx), axis=1)
    w = (w - w[:, :1]) / (w[:, -1:] - w[:, :1])
    pe2 = pe1[:, :1] + (pe1[:, -1:] - pe1[:, :1]) * w
    q = 1.0 + rng.randn(6, km, ny, nx)
    f32 = np.float32
    return (
        jnp.asarray(q, f32), jnp.asarray(pe1, f32),
        jnp.asarray(pe2, f32),
    )


@pytest.mark.parametrize("iv", [1, 0, -1])
@pytest.mark.parametrize("stag", [(0, 0), (1, 0), (0, 1)])
def test_ppm_remap_pallas_matches_jnp(iv, stag):
    from fv3net_tpu.ops.pallas_remap import ppm_remap_pallas
    from fv3net_tpu.ops.remap import ppm_remap

    q, pe1, pe2 = _remap_args(stag=stag)
    ref = jnp.moveaxis(
        ppm_remap(
            jnp.moveaxis(q, 1, 0), jnp.moveaxis(pe1, 1, 0),
            jnp.moveaxis(pe2, 1, 0), iv=iv, kord=9,
            exact_boundaries=True,
        ),
        0, 1,
    )
    out = ppm_remap_pallas(q, pe1, pe2, iv=iv, kord=9, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ppm_remap_pallas_conservative():
    from fv3net_tpu.ops.pallas_remap import ppm_remap_pallas

    q, pe1, pe2 = _remap_args(seed=4)
    out = ppm_remap_pallas(q, pe1, pe2, iv=1, kord=9, interpret=True)
    m1 = np.sum(
        np.asarray(q) * np.asarray(pe1[:, 1:] - pe1[:, :-1]), axis=1
    )
    m2 = np.sum(
        np.asarray(out) * np.asarray(pe2[:, 1:] - pe2[:, :-1]),
        axis=1,
    )
    np.testing.assert_allclose(m2, m1, rtol=2e-4)


# ---------------------------------------------------------------------------
# columnar pressure/Exner chain (ops/pallas_column.py)
# ---------------------------------------------------------------------------


def test_column_pressures_pallas_matches_jnp():
    from fv3net_tpu.constants import (
        KAPPA,
        REFERENCE_SURFACE_PRESSURE as P00,
    )
    from fv3net_tpu.dycore.riemann import layer_mean_pressure
    from fv3net_tpu.ops.pallas_column import column_pressures_pallas

    rng = np.random.RandomState(0)
    F, nz, Y, X = 6, 13, 8, 16
    ptop = 300.0
    dp = jnp.asarray(
        (900.0 + 200.0 * rng.rand(F, nz, Y, X)).astype(np.float32)
    )
    pe, pi, pm = column_pressures_pallas(dp, ptop, interpret=True)
    pe_ref = ptop + jnp.concatenate(
        [jnp.zeros_like(dp[:, :1]), jnp.cumsum(dp, axis=1)], axis=1
    )
    pik = (pe_ref / P00) ** KAPPA
    pi_ref = (
        pik[:, 1:] * pe_ref[:, 1:] - pik[:, :-1] * pe_ref[:, :-1]
    ) / ((1.0 + KAPPA) * dp)
    pm_ref = layer_mean_pressure(dp, pe_ref)
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(pe_ref), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pi), np.asarray(pi_ref), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pm), np.asarray(pm_ref), rtol=1e-5
    )


def test_fv_tp_2d_multi5_matches_per_field():
    """The fused 5-field substep transport (fv_tp_2d_multi5) matches
    five per-field fv_tp_2d calls with the same wiring (delp fluxes
    feeding the mass-weighted transports) to interpret-mode tolerance,
    on physically scaled inputs (CFL ~ 0.2; random unscaled inputs let
    the inner-update denominator cross zero and amplify the
    interpret-vs-jnp rounding noise unboundedly)."""
    from fv3net_tpu.ops.pallas_tp import fv_tp_2d_multi5

    rng = np.random.RandomState(3)
    F, nz, N = 2, 4, 136
    f32 = lambda *s: jnp.asarray(  # noqa: E731
        rng.randn(*s).astype(np.float32)
    )
    sh = (F, nz, N, N)
    dpx = 50.0 + 2.0 * f32(*sh)
    dpy = 50.0 + 2.0 * f32(*sh)
    ptx, pty = 300.0 + 10 * f32(*sh), 300.0 + 10 * f32(*sh)
    wx, wy = f32(*sh), f32(*sh)
    dzx, dzy = -100.0 + 5 * f32(*sh), -100.0 + 5 * f32(*sh)
    ox, oy = 1e-4 * f32(*sh), 1e-4 * f32(*sh)
    crx, cry = 0.2 * f32(*sh), 0.2 * f32(*sh)
    apx = jnp.abs(f32(F, N, N)) + 5.0
    apy = jnp.abs(f32(F, N, N)) + 5.0
    xfx = 0.2 * apx[:, None] * f32(*sh)
    yfx = 0.2 * apy[:, None] * f32(*sh)
    sfx = 0.2 * apx[:, None] * f32(*sh)
    sfy = 0.2 * apy[:, None] * f32(*sh)
    hord = 5
    fx, fy = fv_tp_2d(
        dpx, dpy, crx, cry, xfx, yfx, apx[:, None], apy[:, None], hord
    )
    ref = (fx, fy)
    ref += fv_tp_2d(
        ptx, pty, crx, cry, fx, fy,
        apx[:, None] * dpx, apy[:, None] * dpy, hord,
    )
    ref += fv_tp_2d(
        wx, wy, crx, cry, fx, fy,
        apx[:, None] * dpx, apy[:, None] * dpy, hord,
    )
    ref += fv_tp_2d(
        dzx, dzy, crx, cry, xfx, yfx, apx[:, None], apy[:, None], hord
    )
    ref += fv_tp_2d(
        ox, oy, crx, cry, sfx, sfy, apx[:, None], apy[:, None], hord
    )
    got = fv_tp_2d_multi5(
        dpx, dpy, ptx, pty, wx, wy, dzx, dzy, ox, oy,
        crx, cry, xfx, yfx, sfx, sfy, apx, apy, hord, interpret=True,
    )
    sl = np.s_[:, :, 2:-2, 2:-2]
    for name, a, b in zip(
        "fxd fyd fxt fyt fxw fyw fxz fyz fxo fyo".split(), ref, got
    ):
        a_, b_ = np.asarray(a)[sl], np.asarray(b)[sl]
        np.testing.assert_allclose(
            b_, a_, rtol=5e-3, atol=1e-3,
            err_msg=f"multi5 output {name}",
        )


def test_del4_filter_pallas_matches():
    """The fused del-4 filter kernel equals sw.scalar_filter's jnp
    form: the locally computed halo band of L(q) is exactly the
    canonical exchanged value (fill conventions + per-physical-face
    weight doubling), so one kernel pass replaces the
    exchange-L-exchange-L chain."""
    from fv3net_tpu.dycore.sw import SWMetrics, scalar_filter
    from fv3net_tpu.grid import CubedSphereGrid
    from fv3net_tpu.grid.halo import halo_exchange
    from fv3net_tpu.ops.pallas_filter import del4_filter_pallas

    n, h, nz = 122, 3, 3  # N = 128: the kernel's minimum width
    g = CubedSphereGrid.make(n, halo=h)
    m = SWMetrics.make(g, jnp.float32)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(6, nz, n, n).astype(np.float32))
    ref = scalar_filter(q, m, 0.02)  # jnp path (pallas off on CPU)
    qx = halo_exchange(q, h, fill="x")
    qy = halo_exchange(q, h, fill="y")
    got = del4_filter_pallas(
        qx, qy, m.area_px, m.area_py, 0.02, h, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
