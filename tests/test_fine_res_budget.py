"""Fine-res budget ingredients with eddy-flux decomposition
(workflows/fine_res_budget/budget/budgets.py roles; closes the
VERDICT r3 'no eddy-flux decomposition' gap)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fv3net_tpu.utils.coarsen import block_coarsen
from fv3net_tpu.utils.fine_res_budget import (
    compute_budget_ingredients,
    eddy_flux,
    exposed_area,
    pressure_level_average,
    second_moments,
    storage,
)

NT, NZ, NF, FACTOR = 6, 8, 8, 2
NC = NF // FACTOR


def _delp(n, seed=0, scale=0.0):
    rng = np.random.RandomState(seed)
    base = np.full((NT, NZ, n, n), 1000.0)
    return (base * (1.0 + scale * rng.rand(NT, NZ, n, n))).astype(
        np.float64
    )


def test_constant_field_is_preserved():
    delp_f = _delp(NF, scale=0.05, seed=1)
    delp_c = block_coarsen(delp_f, FACTOR, "mean")
    area = np.ones((NT, NF, NF))
    f = np.full((NT, NZ, NF, NF), 7.5)
    out = pressure_level_average(f, delp_f, delp_c, area, FACTOR)
    assert out.shape == (NT, NZ, NC, NC)
    np.testing.assert_allclose(np.asarray(out), 7.5, rtol=1e-6)


def test_eddy_flux_decomposition():
    """Correlated subgrid structure produces a positive eddy flux;
    uncorrelated structure none."""
    rng = np.random.RandomState(2)
    shape = (NT, NZ, NF, NF)
    # w and T share a checkerboard at fine scale -> correlated
    checker = ((np.indices((NF, NF)).sum(0)) % 2) * 2.0 - 1.0
    w = np.broadcast_to(checker, shape).copy()
    t = 280.0 + 3.0 * w
    wbar = block_coarsen(w, FACTOR, "mean")
    tbar = block_coarsen(t, FACTOR, "mean")
    wtbar = block_coarsen(w * t, FACTOR, "mean")
    ef = np.asarray(eddy_flux(wtbar, wbar, tbar))
    # checkerboard: wbar = 0, bar(wT) = 3*bar(w^2) = 3
    np.testing.assert_allclose(ef, 3.0, rtol=1e-6)
    # uncorrelated: T constant -> no eddy flux
    t2 = np.full(shape, 280.0)
    ef2 = np.asarray(
        eddy_flux(
            block_coarsen(w * t2, FACTOR, "mean"), wbar,
            block_coarsen(t2, FACTOR, "mean"),
        )
    )
    np.testing.assert_allclose(ef2, 0.0, atol=1e-9)


def test_exposed_area_flat_terrain():
    delp_f = _delp(NF)
    delp_c = block_coarsen(delp_f, FACTOR, "mean")
    area = np.ones((NT, NF, NF))
    ea = np.asarray(exposed_area(delp_f, delp_c, area, FACTOR))
    # flat terrain: every coarse midpoint is above the surface ->
    # full block area exposed at every level
    assert ea.shape == (NT, NZ, NC, NC)
    np.testing.assert_allclose(ea, FACTOR * FACTOR, rtol=1e-12)


def test_storage():
    b = np.ones((2, 3))
    e = np.full((2, 3), 4.0)
    np.testing.assert_allclose(storage(b, e, 900.0), 3.0 / 900.0)


def test_full_recipe():
    rng = np.random.RandomState(3)
    delp_f = _delp(NF, scale=0.03, seed=4)
    delp_c = block_coarsen(delp_f, FACTOR, "mean")
    area = 1.0 + 0.1 * rng.rand(NT, NF, NF)
    fine = {
        "pressure_thickness_of_atmospheric_layer": delp_f,
        "omega": rng.randn(NT, NZ, NF, NF),
        "air_temperature": 250.0 + 30.0 * rng.rand(NT, NZ, NF, NF),
        "specific_humidity": 0.01 * rng.rand(NT, NZ, NF, NF),
    }
    out = compute_budget_ingredients(fine, delp_c, area, FACTOR)
    for k in (
        "omega", "air_temperature", "omega_air_temperature",
        "eddy_omega_air_temperature", "eddy_omega_specific_humidity",
        "exposed_area",
    ):
        assert k in out, k
        assert np.isfinite(np.asarray(out[k])).all(), k
        assert np.asarray(out[k]).shape[-2:] == (NC, NC)
    # decomposition identity: bar(wT) = bar(w)bar(T) + eddy
    np.testing.assert_allclose(
        np.asarray(out["omega_air_temperature"]),
        np.asarray(out["omega"]) * np.asarray(out["air_temperature"])
        + np.asarray(out["eddy_omega_air_temperature"]),
        rtol=1e-5,
    )
