"""Restart-coarsening + metrics tests (vcm parity:
coarsen_restarts.py, calc/metrics.py, select.py)."""

import numpy as np
import pytest

from fv3net_tpu.constants import GRAV, RDGAS
from fv3net_tpu.utils import (
    accuracy,
    bias,
    blending_weight,
    coarsen_restarts_on_pressure,
    coarsen_restarts_on_sigma,
    coarsen_restarts_via_blended_method,
    coarsen_sfc_data,
    f1_score,
    histogram,
    impose_hydrostatic_balance,
    precision,
    r2_score,
    recall,
    zonal_average_approximate,
)

NZ, NF, F = 5, 12, 2  # fine grid 12 -> coarse 6
DELP = "pressure_thickness_of_atmospheric_layer"


def _fine_state(seed=0):
    rng = np.random.RandomState(seed)
    delp = 100.0 + 10.0 * rng.rand(6, NZ, NF, NF)
    return {
        DELP: delp,
        "air_temperature": 250.0 + 30.0 * rng.rand(6, NZ, NF, NF),
        "specific_humidity": 1e-3 * rng.rand(6, NZ, NF, NF),
        "x_wind": rng.randn(6, NZ, NF + 1, NF),
        "y_wind": rng.randn(6, NZ, NF, NF + 1),
        "surface_geopotential": 100.0 * rng.rand(6, NF, NF),
    }


@pytest.fixture()
def area():
    rng = np.random.RandomState(1)
    return 1.0 + 0.1 * rng.rand(6, NF, NF)


def test_on_sigma_conserves_column_mass(area):
    state = _fine_state()
    out = coarsen_restarts_on_sigma(state, area, F)
    # column air mass: sum_k delp, area-weighted, must be conserved
    fine_mass = (state[DELP].sum(1) * area).sum()
    from fv3net_tpu.utils import block_coarsen

    area_c = block_coarsen(area, F, "mean")
    coarse_mass = (out[DELP].sum(1) * area_c).sum() * F * F
    np.testing.assert_allclose(coarse_mass, fine_mass, rtol=1e-12)
    assert out["air_temperature"].shape == (6, NZ, NF // F, NF // F)
    assert out["x_wind"].shape == (6, NZ, NF // F + 1, NF // F)
    assert out["y_wind"].shape == (6, NZ, NF // F, NF // F + 1)


def test_on_sigma_constant_field_invariant(area):
    state = _fine_state()
    state["air_temperature"] = np.full((6, NZ, NF, NF), 273.0)
    out = coarsen_restarts_on_sigma(state, area, F)
    np.testing.assert_allclose(out["air_temperature"], 273.0,
                               rtol=1e-12)


def test_on_pressure_conserves_mass_and_runs(area):
    state = _fine_state()
    out = coarsen_restarts_on_pressure(state, area, F, ptop=10.0)
    assert out[DELP].shape == (6, NZ, NF // F, NF // F)
    for k, v in out.items():
        assert np.isfinite(v).all(), k
    # constant tracer stays constant under remap + average
    state["specific_humidity"] = np.full((6, NZ, NF, NF), 4e-4)
    out2 = coarsen_restarts_on_pressure(state, area, F, ptop=10.0)
    np.testing.assert_allclose(
        out2["specific_humidity"], 4e-4, rtol=1e-5
    )


def test_blended_between_methods(area):
    state = _fine_state()
    phis = state["surface_geopotential"]
    out_b = coarsen_restarts_via_blended_method(
        state, area, F, phis=phis, ptop=10.0
    )
    out_s = coarsen_restarts_on_sigma(state, area, F)
    out_p = coarsen_restarts_on_pressure(state, area, F, ptop=10.0)
    t = out_b["air_temperature"]
    lo = np.minimum(out_s["air_temperature"],
                    out_p["air_temperature"])
    hi = np.maximum(out_s["air_temperature"],
                    out_p["air_temperature"])
    assert (t >= lo - 1e-9).all() and (t <= hi + 1e-9).all()


def test_blending_weight_smooth_vs_rough(area):
    smooth = np.zeros((6, NF, NF))
    w = blending_weight(smooth, area, F)
    np.testing.assert_allclose(w, 1.0)
    rough = 1e5 * np.random.RandomState(0).randn(6, NF, NF)
    w2 = blending_weight(rough, area, F)
    assert (w2 < 0.5).all()


def test_hydrostatic_balance_isothermal():
    delp = np.full((6, 3, 4, 4), 100.0)
    temp = np.full((6, 3, 4, 4), 250.0)
    q = np.zeros_like(temp)
    dz = impose_hydrostatic_balance(temp, q, delp, ptop=500.0)
    assert (dz < 0).all()  # dz negative (z decreases with k)
    pe = 500.0 + np.arange(4) * 100.0
    expected = -RDGAS * 250.0 / GRAV * np.log(pe[1:] / pe[:-1])
    np.testing.assert_allclose(dz[0, :, 0, 0], expected, rtol=1e-10)


def test_sfc_data_dominant_type(area):
    rng = np.random.RandomState(0)
    slmsk = rng.randint(0, 2, (6, NF, NF)).astype(np.float64)
    tsfc = np.where(slmsk == 1, 300.0, 280.0)
    out = coarsen_sfc_data(
        {"slmsk": slmsk, "surface_temperature": tsfc}, area, F
    )
    # coarse temperature equals the dominant type's value exactly
    expected = np.where(out["slmsk"] == 1, 300.0, 280.0)
    np.testing.assert_allclose(
        out["surface_temperature"], expected
    )


# ------------------------------------------------------------ metrics


def test_r2_and_errors():
    rng = np.random.RandomState(0)
    truth = rng.randn(1000)
    assert abs(r2_score(truth, truth) - 1.0) < 1e-12
    pred = truth + 0.1 * rng.randn(1000)
    assert 0.9 < r2_score(truth, pred) < 1.0
    assert abs(bias(truth, truth + 0.5) - 0.5) < 1e-12


def test_classification_metrics():
    truth = np.array([True, True, False, False])
    pred = np.array([True, False, True, False])
    assert precision(truth, pred) == 0.5
    assert recall(truth, pred) == 0.5
    assert f1_score(truth, pred) == 0.5
    assert accuracy(truth, pred) == 0.5


def test_histogram_counts():
    counts, edges = histogram(np.arange(100), bins=np.arange(0, 101,
                                                             10))
    assert counts.sum() == 100
    assert (counts == 10).all()


def test_zonal_average_recovers_latitudinal_structure():
    ny = 8
    rng = np.random.RandomState(0)
    lat = np.deg2rad(rng.uniform(-90, 90, (6, ny, ny)))
    field = np.sin(lat) ** 2  # pure function of latitude
    centers, prof = zonal_average_approximate(
        lat, field, bins=np.arange(-90, 91, 10.0)
    )
    valid = ~np.isnan(prof)
    expected = np.sin(np.deg2rad(centers)) ** 2
    # binned averages follow the analytic profile
    assert np.abs(prof[valid] - expected[valid]).mean() < 0.05


def test_zonal_average_3d_field():
    ny = 8
    rng = np.random.RandomState(0)
    lat = np.deg2rad(rng.uniform(-90, 90, (6, ny, ny)))
    field = rng.randn(6, 3, ny, ny)  # [6, z, y, x]
    centers, prof = zonal_average_approximate(lat, field)
    assert prof.shape == (3, len(centers))
