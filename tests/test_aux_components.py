"""Tests for the auxiliary subsystems: emulation hooks, gray radiation,
diagnostics workflow + report, native regrid, device-mesh partitioning,
simple physics."""

import datetime
import os

import numpy as np
import pytest

from fv3net_tpu.grid import CubedSphereGrid
from fv3net_tpu.util.quantity import Quantity


def test_saturation_adjustment_conserves_moist_energy():
    from fv3net_tpu.physics.simple import saturation_adjustment
    from fv3net_tpu.constants import (
        CP_AIR,
        GRAV,
        LATENT_HEAT_VAPORIZATION,
    )

    rng = np.random.RandomState(0)
    shape = (2, 5, 3, 3)
    temp = 260.0 + 30 * rng.rand(*shape)
    qv = 0.02 * rng.rand(*shape)
    qc = 0.001 * rng.rand(*shape)
    p = np.full(shape, 7.0e4)
    delp = np.full(shape, 100.0)
    t2, qv2, qc2, precip = saturation_adjustment(
        temp.copy(), qv.copy(), qc.copy(), p, delp, 900.0
    )
    # moist static energy of the column conserved up to precip removal
    lv_cp = LATENT_HEAT_VAPORIZATION / CP_AIR
    h1 = (temp + lv_cp * qv).sum()
    h2 = (t2 + lv_cp * qv2).sum()
    np.testing.assert_allclose(h1, h2, rtol=1e-10)
    # water conserved: vapor + cloud + precip
    w1 = ((qv + qc) * delp / GRAV).sum()
    w2 = ((qv2 + qc2) * delp / GRAV).sum() + precip.sum()
    np.testing.assert_allclose(w1, w2, rtol=1e-10)
    assert (qv2 >= 0).all() and (qc2 >= -1e-18).all()
    assert (precip >= 0).all()


def test_held_suarez_relaxes_toward_equilibrium():
    from fv3net_tpu.physics.simple import held_suarez_tendencies

    shape = (6, 4, 4, 4)
    temp = np.full(shape, 320.0)  # hotter than t_eq everywhere
    u = np.ones((6, 4, 5, 4))
    v = np.ones((6, 4, 4, 5))
    pe = np.linspace(300.0, 1.0e5, 5).reshape(1, 5, 1, 1) * np.ones(
        (6, 5, 4, 4)
    )
    lat = np.zeros((6, 4, 4))
    dT, du, dv = held_suarez_tendencies(temp, u, v, pe, lat, 900.0)
    assert (dT < 0).all()  # cooling toward t_eq
    assert (du <= 0).all()  # friction decelerates


def test_gray_radiation_driver():
    from fv3net_tpu.physics.radiation import RadiationDriver

    drv = RadiationDriver()
    drv.radupdate(datetime.datetime(2021, 3, 20, 12))
    shape = (6, 5, 4, 4)
    nz = 5
    delp = np.full(shape, 2.0e4)
    p_lay = np.cumsum(delp, axis=1) - 1.0e4
    temp = np.full(shape, 270.0)
    sphum = np.full(shape, 3e-3)
    tsfc = np.full((6, 4, 4), 290.0)
    lon = np.zeros((6, 4, 4))
    lat = np.zeros((6, 4, 4))
    out = drv.gfs_radiation_driver(
        datetime.datetime(2021, 3, 20, 12), lon, lat, p_lay, delp, temp,
        sphum, tsfc,
    )
    sfc_sw = out["total_sky_downward_shortwave_flux_at_surface"]
    assert sfc_sw.shape == (6, 4, 4)
    assert (sfc_sw >= 0).all()
    assert sfc_sw.max() < 1400.0
    # SW heating positive where sun is up; LW cooling negative
    assert out["shortwave_heating_rate"].min() >= 0.0
    assert out["longwave_heating_rate"].max() <= 0.0
    # surface downward LW is a plausible greenhouse value
    assert 50.0 < out[
        "total_sky_downward_longwave_flux_at_surface"
    ].mean() < 500.0


def test_emulation_hook_roundtrip(tmp_path):
    import fv3net_tpu.fit as fit
    from fv3net_tpu.emulation.hooks import MicrophysicsHook
    from fv3net_tpu.emulation.masks import RangeMask

    base = fit.ConstantOutputPredictor(
        ["air_temperature_input"], ["tendency_of_cloud_water"],
        {"tendency_of_cloud_water": -5.0},
    )
    fit.dump(base, str(tmp_path / "emu"))
    hook = MicrophysicsHook(
        str(tmp_path / "emu"),
        masks=[RangeMask("tendency_of_cloud_water", min=-1.0)],
    )
    state = {
        "air_temperature_input": np.full((6, 4, 3, 3), 280.0),
    }
    hook.microphysics(state)
    out = state["tendency_of_cloud_water_output"]
    np.testing.assert_allclose(out, -1.0)  # clipped by the RangeMask


def test_emulation_get_hooks_noop():
    from fv3net_tpu.emulation import get_hooks

    gscond, micro, store = get_hooks()
    state = {"a": np.zeros(3)}
    gscond(state)
    micro(state)
    store(state)
    assert set(state) == {"a"}


def test_interval_schedule_and_time_mask():
    from fv3net_tpu.emulation.masks import IntervalSchedule, TimeMask

    sched = IntervalSchedule(
        period=datetime.timedelta(hours=1),
        initial_time=datetime.datetime(2020, 1, 1),
    )
    assert sched(datetime.datetime(2020, 1, 1, 0, 30)) == 1.0
    assert sched(datetime.datetime(2020, 1, 1, 1, 30)) == 0.0
    tm = TimeMask(sched)
    blended = tm(
        datetime.datetime(2020, 1, 1, 1, 30),
        {"x": np.array([2.0])},
        {"x": np.array([4.0])},
    )
    np.testing.assert_allclose(blended["x"], 2.0)  # physics wins


def test_diagnostics_compute_and_report(tmp_path):
    from fv3net_tpu.diagnostics.compute import compute_diagnostics
    from fv3net_tpu.diagnostics.report import generate_run_report
    from fv3net_tpu.io.zarr_lite import ZarrLiteStore

    g = CubedSphereGrid.make(6, halo=1)
    area = g.area[g.interior]
    store = ZarrLiteStore(str(tmp_path / "run.zarr"))
    data = np.random.RandomState(0).rand(3, 6, 6, 6).astype(np.float32)
    store.create_array("wvp", shape=data.shape, chunks=(1, 6, 6, 6),
                       dtype=np.float32,
                       dims=("time", "tile", "y", "x"))
    store.write_full("wvp", data)
    diags, metrics = compute_diagnostics(str(tmp_path / "run.zarr"),
                                         area)
    assert "wvp_global_mean_timeseries" in diags
    assert diags["wvp_global_mean_timeseries"].shape == (3,)
    assert "time_and_global_mean_value/wvp" in metrics
    path = generate_run_report(
        str(tmp_path / "run.zarr"), area, str(tmp_path / "report.html")
    )
    html = open(path).read()
    assert "<svg" in html and "scalar metrics" in html


def test_native_regrid_conserves_global_mean():
    from fv3net_tpu.regrid import FregridLatLon

    g = CubedSphereGrid.make(12, halo=1)
    rg = FregridLatLon(g, nlat=24, nlon=48, supersample=4)
    # constant field stays constant
    out = rg.regrid(np.full((6, 12, 12), 5.0))
    filled = out[rg.dst_area.reshape(24, 48) > 0]
    np.testing.assert_allclose(filled, 5.0, rtol=1e-12)
    # smooth field: global means agree
    c = g.centers_xyz[g.interior + (np.s_[:],)]
    q = 3.0 + np.sin(2 * c[..., 2]) + c[..., 0]
    out = rg.regrid(q)
    area = g.area[g.interior]
    src_mean = (q * area).sum() / area.sum()
    w = rg.dst_area.reshape(24, 48)
    dst_mean = (out * w).sum() / w.sum()
    np.testing.assert_allclose(dst_mean, src_mean, rtol=1e-3)


def test_mesh_sharding():
    import jax

    from fv3net_tpu.parallel import make_mesh, shard_state, global_mean
    from fv3net_tpu.dycore.hydro import DycoreState
    import jax.numpy as jnp

    n_dev = len(jax.devices())
    csm = make_mesh(n_dev)
    assert csm.n_devices == n_dev
    nz = max(8, csm.z_shards * 2)
    state = DycoreState(
        jnp.ones((6, nz, 4, 4)),
        jnp.full((6, nz, 4, 4), 300.0),
        jnp.zeros((6, nz, 5, 4)),
        jnp.zeros((6, nz, 4, 5)),
    )
    sharded = shard_state(state, csm)
    assert sharded.delp.sharding.mesh.shape["face"] == csm.face_shards
    area = jnp.ones((6, 4, 4))
    gm = jax.jit(global_mean)(sharded.delp[:, 0], area)
    np.testing.assert_allclose(float(gm), 1.0)


def test_timer_and_scalar_sink(tmp_path):
    """Per-substep timing + scalar observability
    (reference runtime/loop.py:516-543, runtime/main.py:47-49)."""
    import time as _t

    from fv3net_tpu.runtime.timing import (
        ScalarSink,
        Timer,
        read_scalars,
        timing_report,
        write_timing_json,
    )

    t = Timer()
    for _ in range(3):
        with t.clock("dynamics"):
            _t.sleep(0.002)
        with t.clock("physics"):
            pass
    rep = timing_report(t)
    assert rep["dynamics"]["count"] == 3
    assert rep["dynamics"]["min"] <= rep["dynamics"]["mean"] <= rep["dynamics"]["max"]
    assert rep["dynamics"]["mean"] >= 0.002
    path = write_timing_json(t, str(tmp_path))
    import json

    assert "physics" in json.load(open(path))

    sink = ScalarSink(str(tmp_path))
    sink.write(0, "2016-08-01 00:15:00", {"a": 1.0, "b": 2.0})
    sink.write(1, "2016-08-01 00:30:00", {"a": 3.0})
    sink.close()
    series = read_scalars(sink.path)
    assert [r["value"] for r in series["a"]] == [1.0, 3.0]


@pytest.mark.slow
def test_segmented_run_emits_timing_and_scalars(tmp_path):
    """A segment leaves timing.json + scalars.jsonl next to its
    diagnostics (VERDICT r2 item 10)."""
    import json
    import os

    from fv3net_tpu.runtime.segmented_run import append, create

    url = str(tmp_path / "run")
    create(url, {
        "namelist": {
            "npx": 7, "npz": 8, "dt_atmos": 600.0, "n_split": 4,
            "segment_steps": 2, "dtype": "float64",
        },
    })
    append(url)
    seg = os.path.join(url, "artifacts", "0000")
    timing = json.load(open(os.path.join(seg, "timing.json")))
    assert "dynamics" in timing and timing["dynamics"]["count"] == 2
    lines = open(os.path.join(seg, "scalars.jsonl")).read().splitlines()
    assert len(lines) >= 2
    rec = json.loads(lines[0])
    assert set(rec) == {"step", "time", "name", "value"}


def test_catalog_grid_and_mask_entries():
    """vcm.catalog role (catalog.py:1-7): grids and masks resolve by
    key; user stores register from code or YAML."""
    import numpy as np

    from fv3net_tpu.utils.catalog import Catalog, catalog

    g = catalog["grid/c12"].read()
    assert g["area"].shape == (6, 12, 12)
    assert np.isfinite(g["area"]).all() and (g["area"] > 0).all()
    m = catalog["landseamask/c12"].read()["land_sea_mask"]
    assert m.shape == (6, 12, 12)
    assert 0.05 < m.mean() < 0.7  # some land, some sea
    assert "grid/c48" in catalog
    assert "grid/c48" in catalog.keys()
    import pytest

    with pytest.raises(KeyError):
        catalog["nonexistent/entry"]


def test_catalog_registered_zarr_and_yaml(tmp_path):
    import numpy as np
    import yaml

    from fv3net_tpu.io.zarr_lite import ZarrLiteStore
    from fv3net_tpu.utils.catalog import Catalog

    store = ZarrLiteStore(str(tmp_path / "x.zarr"))
    arr = np.arange(24.0).reshape(4, 6).astype(np.float32)
    store.create_array("foo", shape=arr.shape, chunks=arr.shape,
                       dtype=np.float32, dims=("a", "b"))
    store.write_full("foo", arr)
    cat = Catalog()
    spec = {"runs/test": {"kind": "zarr",
                          "path": str(tmp_path / "x.zarr")}}
    with open(tmp_path / "cat.yml", "w") as f:
        yaml.safe_dump(spec, f)
    cat.load_yaml(str(tmp_path / "cat.yml"))
    out = cat["runs/test"].read()
    np.testing.assert_array_equal(out["foo"], arr)
