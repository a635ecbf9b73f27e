"""DerivedMapping parity with the reference's 28-name registry
(external/vcm/vcm/derived_mapping.py:114-395)."""

import numpy as np
import pytest

from fv3net_tpu.runtime.derived_state import DerivedMapping
from fv3net_tpu.util.quantity import Quantity

# the full registered-name list of the reference's DerivedMapping
REFERENCE_REGISTRY = [
    "cos_zenith_angle",
    "evaporation",
    "dQu",
    "dQv",
    "eastward_wind",
    "northward_wind",
    "dQu_parallel_to_eastward_wind",
    "dQv_parallel_to_northward_wind",
    "horizontal_wind_tendency_parallel_to_horizontal_wind",
    "net_shortwave_sfc_flux_derived",
    "downward_shortwave_sfc_flux_via_transmissivity",
    "net_shortwave_sfc_flux_via_transmissivity",
    "is_land",
    "is_sea",
    "is_sea_ice",
    "Q1",
    "Q2",
    "pQ1",
    "pQ2",
    "internal_energy",
    "column_integrated_dQ1",
    "column_integrated_dQ2",
    "column_integrated_Q1",
    "column_integrated_Q2",
    "water_vapor_path",
    "upward_heat_flux_at_surface",
    "incloud_water_mixing_ratio",
    "incloud_ice_mixing_ratio",
]


def test_reference_registry_parity():
    missing = [
        n for n in REFERENCE_REGISTRY
        if n not in DerivedMapping._register
    ]
    assert not missing, f"unregistered reference names: {missing}"
    assert len(REFERENCE_REGISTRY) == 28


def _q(arr, dims):
    return Quantity(np.asarray(arr), dims, "")


def _state_3d(nz=4, n=3):
    rng = np.random.RandomState(0)
    dims = ("tile", "z", "y", "x")
    delp = 100.0 + rng.rand(6, nz, n, n)
    return {
        "pressure_thickness_of_atmospheric_layer": _q(delp, dims),
        "air_temperature": _q(280 + rng.randn(6, nz, n, n), dims),
        "dQ1": _q(1e-5 * rng.randn(6, nz, n, n), dims),
        "dQ2": _q(1e-8 * rng.randn(6, nz, n, n), dims),
        "cloud_amount": _q(rng.rand(6, nz, n, n), dims),
        "cloud_water_mixing_ratio": _q(
            1e-4 * rng.rand(6, nz, n, n), dims
        ),
        "cloud_ice_mixing_ratio": _q(
            1e-5 * rng.rand(6, nz, n, n), dims
        ),
    }


def test_q1_q2_sum_and_fallback():
    dm = DerivedMapping(_state_3d())
    np.testing.assert_allclose(
        dm["Q1"].values, dm["pQ1"].values + dm["dQ1"].values
    )
    np.testing.assert_allclose(
        dm["Q2"].values, dm["pQ2"].values + dm["dQ2"].values
    )
    # without dQ1/dQ2 present, Q1/Q2 fall back to pQ1/pQ2 (zeros)
    st = _state_3d()
    del st["dQ1"], st["dQ2"]
    dm2 = DerivedMapping(st)
    assert np.all(dm2["Q1"].values == 0.0)
    assert np.all(dm2["Q2"].values == 0.0)


def test_internal_energy_is_cv_t():
    from fv3net_tpu.constants import CV_AIR

    dm = DerivedMapping(_state_3d())
    np.testing.assert_allclose(
        dm["internal_energy"].values,
        CV_AIR * dm["air_temperature"].values,
    )


def test_column_integrals():
    from fv3net_tpu.constants import CV_AIR, GRAV

    st = _state_3d()
    dm = DerivedMapping(st)
    delp = st["pressure_thickness_of_atmospheric_layer"].values
    expected = (CV_AIR / GRAV) * (st["dQ1"].values * delp).sum(axis=1)
    np.testing.assert_allclose(
        dm["column_integrated_dQ1"].values, expected
    )
    assert dm["column_integrated_dQ1"].values.shape == (6, 3, 3)
    # Q2 integral in mm/day carries the 86400 factor
    expected2 = (
        (st["dQ2"].values * delp).sum(axis=1) / GRAV * 86400.0
    )
    np.testing.assert_allclose(
        dm["column_integrated_dQ2"].values, expected2
    )


def test_incloud_condensate_normalization():
    st = _state_3d()
    cf = np.zeros((6, 4, 3, 3))
    cf[0, 0] = 0.5   # normal: divide by cf
    cf[1, 0] = 0.01  # between climits: divide by climit2
    cf[2, 0] = 1e-4  # below climit1: untouched
    st["cloud_amount"] = _q(cf, ("tile", "z", "y", "x"))
    dm = DerivedMapping(st)
    q = st["cloud_water_mixing_ratio"].values
    out = dm["incloud_water_mixing_ratio"].values
    np.testing.assert_allclose(out[0, 0], q[0, 0] / 0.5)
    np.testing.assert_allclose(out[1, 0], q[1, 0] / 5.0e-2)
    np.testing.assert_allclose(out[2, 0], q[2, 0])


def test_wind_rotation_and_projection():
    nz, n = 2, 3
    dims3 = ("tile", "z", "y", "x")
    dims2 = ("tile", "y", "x")
    ones = np.ones((6, n, n))
    state = {
        # identity rotation: east = x, north = y
        "eastward_wind_u_coeff": _q(ones, dims2),
        "eastward_wind_v_coeff": _q(0 * ones, dims2),
        "northward_wind_u_coeff": _q(0 * ones, dims2),
        "northward_wind_v_coeff": _q(ones, dims2),
        "x_wind": _q(np.full((6, nz, n + 1, n), 2.0), dims3),
        "y_wind": _q(np.full((6, nz, n, n + 1), 3.0), dims3),
        "dQxwind": _q(np.full((6, nz, n + 1, n), -1.0), dims3),
        "dQywind": _q(np.full((6, nz, n, n + 1), 0.5), dims3),
    }
    dm = DerivedMapping(state)
    np.testing.assert_allclose(dm["eastward_wind"].values, 2.0)
    np.testing.assert_allclose(dm["northward_wind"].values, 3.0)
    np.testing.assert_allclose(dm["dQu"].values, -1.0)
    np.testing.assert_allclose(dm["dQv"].values, 0.5)
    # dQu is anti-parallel to u (+2): parallel projection flips sign
    np.testing.assert_allclose(
        dm["dQu_parallel_to_eastward_wind"].values, -1.0
    )
    np.testing.assert_allclose(
        dm["dQv_parallel_to_northward_wind"].values, 0.5
    )
    proj = dm[
        "horizontal_wind_tendency_parallel_to_horizontal_wind"
    ].values
    assert proj.shape == (6, nz, n, n)
    assert np.isfinite(proj).all()


def test_shortwave_flux_derivations():
    dims2 = ("tile", "y", "x")
    n = 3
    state = {
        "surface_diffused_shortwave_albedo": _q(
            np.full((6, n, n), 0.25), dims2
        ),
        "override_for_time_adjusted_total_sky_downward_shortwave_"
        "flux_at_surface": _q(np.full((6, n, n), 400.0), dims2),
        "total_sky_downward_shortwave_flux_at_top_of_atmosphere": _q(
            np.full((6, n, n), 1000.0), dims2
        ),
        "shortwave_transmissivity_of_atmospheric_column": _q(
            np.full((6, n, n), 0.6), dims2
        ),
    }
    dm = DerivedMapping(state)
    np.testing.assert_allclose(
        dm["net_shortwave_sfc_flux_derived"].values, 300.0
    )
    np.testing.assert_allclose(
        dm["downward_shortwave_sfc_flux_via_transmissivity"].values,
        600.0,
    )
    np.testing.assert_allclose(
        dm["net_shortwave_sfc_flux_via_transmissivity"].values, 450.0
    )


def test_upward_heat_flux():
    dims2 = ("tile", "y", "x")
    n = 2
    state = {
        "total_sky_upward_shortwave_flux_at_surface": _q(
            np.full((6, n, n), 50.0), dims2
        ),
        "total_sky_upward_longwave_flux_at_surface": _q(
            np.full((6, n, n), 390.0), dims2
        ),
        "sensible_heat_flux": _q(np.full((6, n, n), 20.0), dims2),
    }
    dm = DerivedMapping(state)
    np.testing.assert_allclose(
        dm["upward_heat_flux_at_surface"].values, 460.0
    )
