"""The gather-based exchange transposes (grid/halo_transpose.py) must
equal autodiff's scatter-add transpose to roundoff, and forward-mode
must still work through linear_call."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fv3net_tpu.grid.halo import (
    halo_exchange_cgrid,
    halo_exchange_dgrid,
    _dgrid_tables,
    _staggered_strip_exchange,
    _dgrid_affine_plans,
    _cgrid_tables,
    _cgrid_affine_plans,
)

N, H, NZ = 8, 3, 2


def _raw_dgrid(u, v, h=H):
    n = u.shape[-1]
    return _staggered_strip_exchange(
        u, v, _dgrid_tables(n, h), h, n + 1, n, n, n + 1, u.dtype,
        _dgrid_affine_plans(n, h),
    )


def _raw_cgrid(uc, vc, fill, h=H):
    n = uc.shape[-2]
    return _staggered_strip_exchange(
        uc, vc, _cgrid_tables(n, h, fill), h, n, n + 1, n + 1, n,
        uc.dtype, _cgrid_affine_plans(n, h, fill),
    )


def test_dgrid_forward_unchanged():
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(6, NZ, N + 1, N))
    v = jnp.asarray(rng.randn(6, NZ, N, N + 1))
    up, vp = halo_exchange_dgrid(u, v, H)
    up_r, vp_r = _raw_dgrid(u, v)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(up_r))
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vp_r))


def test_dgrid_transpose_matches_autodiff():
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.randn(6, NZ, N + 1, N))
    v = jnp.asarray(rng.randn(6, NZ, N, N + 1))
    ct = (
        jnp.asarray(rng.randn(6, NZ, N + 2 * H + 1, N + 2 * H)),
        jnp.asarray(rng.randn(6, NZ, N + 2 * H, N + 2 * H + 1)),
    )
    _, vjp_new = jax.vjp(lambda a, b: halo_exchange_dgrid(a, b, H),
                         u, v)
    _, vjp_old = jax.vjp(lambda a, b: _raw_dgrid(a, b), u, v)
    du_new, dv_new = vjp_new(ct)
    du_old, dv_old = vjp_old(ct)
    np.testing.assert_allclose(
        np.asarray(du_new), np.asarray(du_old), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(dv_new), np.asarray(dv_old), atol=1e-13
    )


@pytest.mark.parametrize("fill", ["x", "y"])
def test_cgrid_transpose_matches_autodiff(fill):
    rng = np.random.RandomState(2)
    uc = jnp.asarray(rng.randn(6, NZ, N, N + 1))
    vc = jnp.asarray(rng.randn(6, NZ, N + 1, N))
    ct = (
        jnp.asarray(rng.randn(6, NZ, N + 2 * H, N + 2 * H + 1)),
        jnp.asarray(rng.randn(6, NZ, N + 2 * H + 1, N + 2 * H)),
    )
    _, vjp_new = jax.vjp(
        lambda a, b: halo_exchange_cgrid(a, b, H, fill), uc, vc
    )
    _, vjp_old = jax.vjp(
        lambda a, b: _raw_cgrid(a, b, fill), uc, vc
    )
    du_new, dv_new = vjp_new(ct)
    du_old, dv_old = vjp_old(ct)
    np.testing.assert_allclose(
        np.asarray(du_new), np.asarray(du_old), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(dv_new), np.asarray(dv_old), atol=1e-13
    )


def test_jacfwd_still_works():
    """linear_call must preserve forward-mode (the sw spectral-radius
    gates use jacfwd through the exchanges)."""
    u = jnp.zeros((6, N + 1, N))
    v = jnp.zeros((6, N, N + 1))

    def f(eps):
        up, vp = halo_exchange_dgrid(u + eps, v, H)
        return jnp.sum(up ** 2) + jnp.sum(vp)

    g = jax.jacfwd(f)(0.0)
    assert np.isfinite(float(g))


def test_dampers_unchanged_through_linear_call():
    """div/corner dampers (vjp-built) give identical results with the
    custom transpose wired in."""
    from fv3net_tpu.dycore.sw import (
        SWMetrics,
        corner_div_damp,
        div_damp,
    )
    from fv3net_tpu.grid import CubedSphereGrid

    g = CubedSphereGrid.make(N, halo=H)
    m = SWMetrics.make(g, jnp.float64)
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.randn(6, NZ, N + 1, N))
    v = jnp.asarray(rng.randn(6, NZ, N, N + 1))
    du, dv = div_damp(u, v, m, 0.12)
    duc, dvc = corner_div_damp(u, v, m, 0.02)
    assert np.isfinite(np.asarray(du)).all()
    assert np.isfinite(np.asarray(dvc)).all()
    # dissipativity: the damper must not increase the wind "energy"
    dot = float(jnp.sum(u * du) + jnp.sum(v * dv))
    assert dot <= 1e-10, dot
    dotc = float(jnp.sum(u * duc) + jnp.sum(v * dvc))
    assert dotc <= 1e-10, dotc
