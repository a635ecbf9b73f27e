"""zarr-lite store and science-utils tests."""

import json
import os

import numpy as np
import pytest

from fv3net_tpu.io.zarr_lite import ZarrLiteStore, open_zarr_lite
from fv3net_tpu.utils import thermo
from fv3net_tpu.utils.coarsen import (
    block_coarsen,
    block_edge_sum,
    block_median,
    block_mode,
    block_upsample,
    edge_weighted_block_average,
    weighted_block_average,
)
from fv3net_tpu.utils.interpolate import (
    PRESSURE_GRID,
    interpolate_to_pressure_levels,
)
from fv3net_tpu.utils.zenith import cos_zenith_angle


def test_zarr_lite_roundtrip(tmp_path):
    store = ZarrLiteStore(str(tmp_path / "test.zarr"))
    data = np.random.RandomState(0).rand(4, 6, 6).astype(np.float32)
    store.create_array(
        "foo", shape=data.shape, chunks=(2, 6, 6), dtype=np.float32,
        dims=("time", "y", "x"), attrs={"units": "m"},
    )
    store.write_full("foo", data)
    out = store.read("foo")
    np.testing.assert_array_equal(out, data)
    assert store.attrs("foo")["_ARRAY_DIMENSIONS"] == ["time", "y", "x"]
    # the store is structurally valid zarr v2
    meta = json.load(open(tmp_path / "test.zarr" / "foo" / ".zarray"))
    assert meta["zarr_format"] == 2
    assert meta["compressor"] is None


def test_zarr_lite_append(tmp_path):
    store = ZarrLiteStore(str(tmp_path / "a.zarr"))
    store.create_array("t", shape=(0, 3), chunks=(2, 3),
                       dtype=np.float64, dims=("time", "x"))
    a = np.arange(6.0).reshape(2, 3)
    b = np.arange(6.0, 15.0).reshape(3, 3)
    store.append("t", a, axis=0)
    with pytest.raises(ValueError):
        # now at extent 2 (chunk boundary ok); append 3 -> extent 5,
        # next append would start off-boundary
        store.append("t", b, axis=0)
        store.append("t", a, axis=0)
    out = store.read("t")[:2]
    np.testing.assert_array_equal(out, a)


def test_coarsen_ops():
    a = np.arange(36.0).reshape(6, 6)
    c = block_coarsen(a, 2, "mean")
    assert c.shape == (3, 3)
    np.testing.assert_allclose(c[0, 0], np.mean([0, 1, 6, 7]))
    w = np.ones((6, 6))
    np.testing.assert_allclose(
        weighted_block_average(a, w, 2), block_coarsen(a, 2, "mean")
    )
    s = block_coarsen(a, 2, "sum")
    np.testing.assert_allclose(s[0, 0], 14.0)
    m = block_median(a, 3)
    assert m.shape == (2, 2)
    up = block_upsample(c, 2)
    assert up.shape == (6, 6)
    cat = np.array([[1, 1], [2, 1]])
    assert block_mode(cat, 2)[0, 0] == 1

    stag = np.arange(28.0).reshape(7, 4)  # y-staggered: 7 rows, 4 cols
    es = block_edge_sum(stag, 2, axis=-1)
    assert es.shape == (4, 2)
    ew = edge_weighted_block_average(
        np.ones((7, 4)), np.ones((7, 4)), 2, axis=-1
    )
    assert ew.shape == (4, 2)
    np.testing.assert_allclose(ew, 1.0)


def test_thermo_roundtrips():
    p = np.array([5.0e4])
    T = np.array([260.0])
    theta = thermo.potential_temperature(p, T)
    np.testing.assert_allclose(
        thermo.temperature_from_potential(p, theta), T
    )
    q = np.array([5e-3])
    rh = thermo.relative_humidity_from_pressure(T, q, p)
    q2 = thermo.specific_humidity_from_rh(T, rh, p)
    np.testing.assert_allclose(q2, q, rtol=1e-12)


def test_pressure_interface_and_integrate():
    delp = np.full((1, 5, 2, 2), 100.0)
    pe = thermo.pressure_interface(delp, toa_pressure=300.0)
    assert pe.shape == (1, 6, 2, 2)
    np.testing.assert_allclose(pe[:, 0], 300.0)
    np.testing.assert_allclose(pe[:, -1], 800.0)
    q = np.ones((1, 5, 2, 2))
    col = thermo.mass_integrate(q, delp)
    np.testing.assert_allclose(col, 500.0 / 9.80665, rtol=1e-6)


def test_interpolate_to_pressure_levels():
    nz = 20
    delp = np.full((1, nz, 3, 3), (1.0e5 - 300.0) / nz)
    pm = thermo.pressure_at_midpoint_log(delp)
    field = pm * 2.0  # linear in p
    out = interpolate_to_pressure_levels(field, delp)
    assert out.shape == (1, len(PRESSURE_GRID), 3, 3)
    # mid-range levels interpolate to ~2*level
    k = np.searchsorted(PRESSURE_GRID, 5.0e4)
    np.testing.assert_allclose(
        out[0, k, 0, 0], 2 * PRESSURE_GRID[k], rtol=1e-3
    )


def test_cos_zenith_angle_basics():
    import datetime

    # sun overhead near equator at local noon ~ March equinox
    t = datetime.datetime(2021, 3, 20, 12, 0, 0)
    cz_noon = cos_zenith_angle(t, 0.0, 0.0)
    assert cz_noon > 0.95
    cz_night = cos_zenith_angle(t, 180.0, 0.0)
    assert cz_night < -0.9
    # vectorized
    cz = cos_zenith_angle(t, np.array([0.0, 90.0]), np.array([0.0, 0.0]))
    assert cz.shape == (2,)
