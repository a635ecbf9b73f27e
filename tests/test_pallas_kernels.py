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
