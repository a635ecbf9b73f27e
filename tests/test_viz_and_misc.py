"""Tests for fv3viz-role plotting, FV3Log parsing, DataTransform
registry, ZarrMapping, interpolate_unstructured, checksum utilities
(SURVEY 2.2: fv3viz, vcm/fv3/logs.py, vcm/data_transform.py,
vcm/_zarr_mapping.py, vcm/interpolate.py:246, vcm/testing.py)."""

import datetime

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.io.zarr_lite import ZarrLiteStore
from fv3net_tpu.io.zarr_mapping import ZarrMapping
from fv3net_tpu.util.quantity import Quantity
from fv3net_tpu.utils import fv3logs
from fv3net_tpu.utils.data_transform import (
    ChainedDataTransform,
    DataTransform,
    TRANSFORM_REGISTRY,
)
from fv3net_tpu.utils.interpolate import interpolate_unstructured
from fv3net_tpu.utils.testing import (
    checksum_array,
    checksum_state,
    regression_data,
)
from fv3net_tpu.viz import (
    infer_cmap_params,
    pcolormesh_cube,
    plot_cube,
    plot_diurnal_cycle,
    plot_time_series,
)


# ------------------------------------------------------------------ viz


def test_infer_cmap_params_diverging():
    p = infer_cmap_params(np.array([-2.0, 1.0]))
    assert p["cmap"] == "RdBu_r"
    assert p["vmin"] == -2.0 and p["vmax"] == 2.0


def test_infer_cmap_params_sequential_robust():
    data = np.concatenate([np.ones(98), np.array([100.0, 1000.0])])
    p = infer_cmap_params(data, robust=True)
    assert p["cmap"] == "viridis"
    assert p["vmax"] < 1000.0


def test_pcolormesh_cube_and_plot_cube(tmp_path):
    g = CubedSphereGrid.make(8, halo=0)
    data = np.cos(g.lat) * np.cos(g.lon)
    fig, ax = plt.subplots()
    h = pcolormesh_cube(
        np.rad2deg(g.lat_b), np.rad2deg(g.lon_b), data, ax=ax
    )
    assert h is not None
    plt.close(fig)
    fig, ax, h = plot_cube(data, grid=g, title="test")
    fig.savefig(tmp_path / "cube.png")
    plt.close(fig)
    assert (tmp_path / "cube.png").stat().st_size > 0


def test_plot_diurnal_cycle_binning():
    t = np.linspace(0, 24, 1000, endpoint=False)
    v = np.sin(2 * np.pi * t / 24.0)
    fig, ax = plt.subplots()
    _, means = plot_diurnal_cycle(t, v, ax=ax, n_bins=24)
    plt.close(fig)
    assert means.shape == (24,)
    assert abs(means[6] - 1.0) < 0.1  # peak near 6hr for sin
    fig, ax = plt.subplots()
    plot_time_series(np.arange(5), np.random.rand(5, 3), ax=ax)
    plt.close(fig)


# ------------------------------------------------------------- fv3 logs


def test_fv3log_roundtrip():
    text = ""
    for step in range(3):
        date = datetime.datetime(2016, 8, 1, step)
        text += fv3logs.dumps_statistics_block(
            date,
            {
                "total surface pressure": 982.0 + step,
                "mean dry air mass": 98300.0,
                "total water vapor": 23.5 - 0.1 * step,
            },
        )
    log = fv3logs.loads(text)
    assert len(log.dates) == 3
    assert log.dates[1] == datetime.datetime(2016, 8, 1, 1)
    assert log.totals["total surface pressure"] == [982.0, 983.0,
                                                    984.0]
    assert "total water vapor" in log.variables


def test_fv3log_parses_fortran_style():
    text = """
 fv3 time  2016 8 1 0 15 0
  total surface pressure       =   982.12345
  mean dry surface pressure    =   980.0D+00
 garbage line without equals
"""
    log = fv3logs.loads(text)
    assert log.totals["total surface pressure"] == [982.12345]
    assert log.totals["mean dry surface pressure"] == [980.0]


# ------------------------------------------------------- data transform


def test_data_transform_q1_qm_chain():
    shape = (6, 4, 4, 4)
    rng = np.random.RandomState(0)
    dims = ("tile", "z", "y", "x")
    state = {
        "dQ1": Quantity(rng.rand(*shape), dims, "K/s"),
        "pQ1": Quantity(rng.rand(*shape), dims, "K/s"),
        "dQ2": Quantity(rng.rand(*shape), dims, "kg/kg/s"),
        "pQ2": Quantity(rng.rand(*shape), dims, "kg/kg/s"),
    }
    chain = ChainedDataTransform([
        DataTransform("Q1_from_dQ1_pQ1"),
        DataTransform("Q2_from_dQ2_pQ2"),
        DataTransform("Qm_from_Q1_Q2"),
    ])
    assert set(chain.input_variables) == {"dQ1", "pQ1", "dQ2", "pQ2"}
    assert "Qm" in chain.output_variables
    out = chain.apply(state)
    np.testing.assert_allclose(
        out["Q1"].values, state["dQ1"].values + state["pQ1"].values
    )
    assert np.isfinite(out["Qm"].values).all()


def test_implied_precip_transform():
    from fv3net_tpu.constants import GRAV, LATENT_HEAT_VAPORIZATION

    dims = ("tile", "z", "y", "x")
    q2 = -np.full((6, 3, 2, 2), 1e-7)
    delp = np.full((6, 3, 2, 2), 1e4)
    lhf = np.full((6, 2, 2), 50.0)
    state = {
        "Q2": Quantity(q2, dims, "kg/kg/s"),
        "pressure_thickness_of_atmospheric_layer": Quantity(
            delp, dims, "Pa"
        ),
        "latent_heat_flux": Quantity(
            lhf, ("tile", "y", "x"), "W/m**2"
        ),
    }
    out = DataTransform(
        "implied_surface_precipitation_rate"
    ).apply(state)
    expected = 3 * 1e-7 * 1e4 / GRAV + 50.0 / LATENT_HEAT_VAPORIZATION
    np.testing.assert_allclose(
        out["implied_surface_precipitation_rate"].values, expected,
        rtol=1e-6,
    )
    # rectification: strongly drying column -> zero, never negative
    state["Q2"] = Quantity(-q2 * 100, dims, "kg/kg/s")
    out = DataTransform(
        "implied_surface_precipitation_rate"
    ).apply(state)
    np.testing.assert_allclose(
        out["implied_surface_precipitation_rate"].values, 0.0
    )


def test_qm_matches_reference_formula():
    from fv3net_tpu.constants import (
        CP_AIR,
        LATENT_HEAT_VAPORIZATION,
        RDGAS,
    )

    dims = ("tile", "z", "y", "x")
    rng = np.random.RandomState(1)
    q1 = rng.randn(6, 3, 2, 2) * 1e-5
    q2 = rng.randn(6, 3, 2, 2) * 1e-8
    state = {
        "Q1": Quantity(q1, dims, "K/s"),
        "Q2": Quantity(q2, dims, "kg/kg/s"),
    }
    out = DataTransform("Qm_from_Q1_Q2").apply(state)
    np.testing.assert_allclose(
        out["Qm"].values,
        (CP_AIR - RDGAS) * q1 + LATENT_HEAT_VAPORIZATION * q2,
    )
    # round-trips through the inverse
    back = DataTransform("Q1_from_Qm_Q2").apply(out)
    np.testing.assert_allclose(back["Q1"].values, q1, atol=1e-12)


def test_registry_has_reference_names():
    assert "Q1_from_dQ1_pQ1" in TRANSFORM_REGISTRY
    assert "Qm_from_Q1_Q2" in TRANSFORM_REGISTRY


# --------------------------------------------------------- zarr mapping


def test_zarr_mapping_parallel_slots(tmp_path):
    schema = {
        "T": (("y", "x"), (4, 4), "float32"),
        "ps": ((), (), "float32"),
    }
    times = ["t0", "t1", "t2"]
    tiles = [0, 1, 2, 3, 4, 5]
    zm = ZarrMapping.from_schema(
        str(tmp_path / "store.zarr"), schema,
        {"time": times, "tile": tiles}, ["time", "tile"],
    )
    rng = np.random.RandomState(1)
    expect = rng.rand(3, 6, 4, 4).astype(np.float32)
    # write out of order, one slot at a time (parallel-writer pattern)
    for it, t in list(enumerate(times))[::-1]:
        for tile in tiles:
            zm[(t, tile)] = {
                "T": expect[it, tile],
                "ps": np.float32(it * 10 + tile),
            }
    got = zm.read("T")
    np.testing.assert_array_equal(got, expect)
    ps = zm.read("ps")
    assert ps[2, 3] == 23.0


def test_zarr_mapping_store_is_real_zarr(tmp_path):
    import json
    import os

    zm = ZarrMapping.from_schema(
        str(tmp_path / "s.zarr"),
        {"a": (("x",), (3,), "float64")},
        {"time": ["a", "b"]}, ["time"],
    )
    zm[("a",)] = {"a": np.arange(3.0)}
    meta = json.load(
        open(tmp_path / "s.zarr" / "a" / ".zarray")
    )
    assert meta["shape"] == [2, 3]
    assert meta["chunks"] == [1, 3]


# --------------------------------------------- unstructured interp


def test_interpolate_unstructured_nearest_sphere():
    # source: coarse ring on equator; target points sit near sources
    src_lon = np.array([0.0, 90.0, 180.0, 270.0])
    src_lat = np.zeros(4)
    tgt_lon = np.array([1.0, 91.0, 359.0])
    tgt_lat = np.array([0.5, -0.5, 0.0])
    data = {"f": np.array([10.0, 20.0, 30.0, 40.0])}
    out = interpolate_unstructured(
        data, {"lon": (src_lon, tgt_lon), "lat": (src_lat, tgt_lat)}
    )
    np.testing.assert_array_equal(out["f"], [10.0, 20.0, 10.0])


def test_interpolate_unstructured_batched_fields():
    src_lon = np.array([0.0, 180.0])
    src_lat = np.array([0.0, 0.0])
    data = {"f": np.arange(10).reshape(5, 2)}
    out = interpolate_unstructured(
        data,
        {"lon": (src_lon, np.array([10.0])),
         "lat": (src_lat, np.array([5.0]))},
    )
    np.testing.assert_array_equal(out["f"][:, 0],
                                  np.arange(10).reshape(5, 2)[:, 0])


# ------------------------------------------------------------ checksums


def test_checksum_sensitivity():
    a = np.arange(12.0).reshape(3, 4)
    c1 = checksum_array(a)
    assert c1 == checksum_array(a.copy())
    b = a.copy()
    b[0, 0] += 1e-12
    assert checksum_array(b) != c1
    assert checksum_array(a.astype(np.float32)) != c1


def test_checksum_state_and_regression_format():
    state = {
        "T": Quantity(np.ones((2, 2)), ("y", "x"), "K"),
        "q": Quantity(np.zeros((2, 2)), ("y", "x"), ""),
    }
    s = checksum_state(state)
    assert s == checksum_state(dict(reversed(list(state.items()))))
    text = regression_data(state)
    assert text.startswith("T: ") and "\nq: " in text
