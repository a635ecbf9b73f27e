"""NetCDF3 codec + Fortran restart ingestion tests.

The codec is validated against scipy.io.netcdf_file as an independent
implementation of the classic format, in both directions (our writer ->
scipy reader, scipy writer -> our reader); the restart layer is gated
on a synthesized FV3GFS run directory (per-tile fv_core.res /
fv_tracer.res / fv_srf_wnd.res / sfc_data files with FMS axis names and
a Time record dim) and on driving the dycore from the ingested state —
the reference's init-from-restart path (vcm/fv3_restarts/io.py,
pace.util.open_restart usage at runtime/nudging.py:111-133).
"""

import datetime
import os

import numpy as np
import pytest

from fv3net_tpu.io import netcdf3
from fv3net_tpu.io.restarts import (
    open_restarts,
    read_coupler_res,
    restarts_from_state,
    state_from_restarts,
    write_coupler_res,
    write_restarts,
    yield_restart_files,
)
from fv3net_tpu.util.quantity import Quantity


def _sample_dataset():
    rng = np.random.RandomState(0)
    dims = {"Time": None, "zaxis_1": 4, "yaxis_1": 3, "xaxis_1": 3}
    variables = {
        "T": netcdf3.Variable(
            rng.rand(2, 4, 3, 3),
            ("Time", "zaxis_1", "yaxis_1", "xaxis_1"),
            {"units": "K", "long_name": "temperature"},
        ),
        "phis": netcdf3.Variable(
            rng.rand(2, 3, 3).astype(np.float32),
            ("Time", "yaxis_1", "xaxis_1"),
            {"units": "m**2/s**2"},
        ),
        "counts": netcdf3.Variable(
            np.arange(12, dtype=np.int32).reshape(4, 3),
            ("zaxis_1", "yaxis_1"),
            {},
        ),
    }
    return netcdf3.Dataset(dims, variables, {"title": "sample", "n": 3})


@pytest.mark.parametrize("version", [1, 2])
def test_roundtrip_own_codec(tmp_path, version):
    ds = _sample_dataset()
    path = str(tmp_path / "sample.nc")
    netcdf3.write(path, ds, version=version)
    back = netcdf3.read(path)
    assert back.dimensions == ds.dimensions
    assert back.attrs["title"] == "sample"
    assert back.attrs["n"] == 3
    for name, var in ds.variables.items():
        np.testing.assert_array_equal(back.variables[name].data, var.data)
        assert back.variables[name].dims == var.dims
    assert back.variables["T"].attrs["units"] == "K"


def test_scipy_reads_our_files(tmp_path):
    from scipy.io import netcdf_file

    ds = _sample_dataset()
    path = str(tmp_path / "ours.nc")
    netcdf3.write(path, ds)
    with netcdf_file(path, "r", mmap=False) as f:
        assert f.title == b"sample"
        np.testing.assert_allclose(
            f.variables["T"][:], ds.variables["T"].data
        )
        np.testing.assert_allclose(
            f.variables["phis"][:], ds.variables["phis"].data
        )
        np.testing.assert_array_equal(
            f.variables["counts"][:], ds.variables["counts"].data
        )
        assert f.variables["T"].dimensions == (
            "Time", "zaxis_1", "yaxis_1", "xaxis_1",
        )


def test_we_read_scipy_files(tmp_path):
    from scipy.io import netcdf_file

    path = str(tmp_path / "scipy.nc")
    rng = np.random.RandomState(1)
    t = rng.rand(3, 2, 5)
    with netcdf_file(path, "w") as f:
        f.createDimension("Time", None)
        f.createDimension("z", 2)
        f.createDimension("x", 5)
        v = f.createVariable("w", np.float64, ("Time", "z", "x"))
        v[:] = t
        v.units = "m/s"
        s = f.createVariable("static", np.float32, ("z", "x"))
        s[:] = t[0].astype(np.float32)
        f.history = "made by scipy"

    back = netcdf3.read(path)
    np.testing.assert_allclose(back.variables["w"].data, t)
    np.testing.assert_allclose(
        back.variables["static"].data, t[0].astype(np.float32)
    )
    assert back.variables["w"].attrs["units"] == "m/s"
    assert back.attrs["history"] == "made by scipy"
    assert back.dimensions == {"Time": None, "z": 2, "x": 5}


def test_single_record_variable_packing(tmp_path):
    # the classic-format special case: one record variable packs
    # contiguously with no per-record padding
    from scipy.io import netcdf_file

    data = np.arange(10, dtype=np.int16).reshape(5, 2)
    ds = netcdf3.Dataset(
        {"Time": None, "x": 2},
        {"v": netcdf3.Variable(data, ("Time", "x"), {})},
        {},
    )
    path = str(tmp_path / "single.nc")
    netcdf3.write(path, ds)
    with netcdf_file(path, "r", mmap=False) as f:
        np.testing.assert_array_equal(f.variables["v"][:], data)
    np.testing.assert_array_equal(netcdf3.read(path).variables["v"].data, data)


def _synth_state(n=6, nz=5):
    from fv3net_tpu.dycore.hydro import DycoreState

    rng = np.random.RandomState(2)
    delp = np.full((6, nz, n, n), 1e5 / nz) + rng.rand(6, nz, n, n)
    return DycoreState(
        delp=delp.astype(np.float32),
        pt=(280 + 10 * rng.rand(6, nz, n, n)).astype(np.float32),
        u=rng.randn(6, nz, n + 1, n).astype(np.float32),
        v=rng.randn(6, nz, n, n + 1).astype(np.float32),
        q=(1e-3 * rng.rand(2, 6, nz, n, n)).astype(np.float32),
        w=(0.1 * rng.randn(6, nz, n, n)).astype(np.float32),
        delz=(-200 - rng.rand(6, nz, n, n)).astype(np.float32),
    )


def test_restart_directory_roundtrip(tmp_path):
    n, nz, ptop = 6, 5, 300.0
    state = _synth_state(n, nz)
    phis = np.random.RandomState(3).rand(6, n, n).astype(np.float32)
    fields = restarts_from_state(state, phis, ptop)
    fields["tsea"] = Quantity(
        290 + np.random.RandomState(4).rand(6, n, n), ("tile", "grid_yt", "grid_xt"), "K"
    )
    rundir = str(tmp_path / "run")
    t0 = datetime.datetime(2016, 8, 1, 3, 0, 0)
    write_restarts(fields, rundir, time=t0, subdir="INPUT")

    found = list(yield_restart_files(rundir))
    cats = {c for _, c, _, _ in found}
    assert cats == {"fv_core.res", "fv_tracer.res", "sfc_data"}
    assert len(found) == 18  # 3 categories x 6 tiles

    opened = open_restarts(rundir)["INPUT"]
    # dims standardized per category
    assert opened["T"].dims == ("tile", "pfull", "grid_yt", "grid_xt")
    assert opened["u"].dims == ("tile", "pfull", "grid_y", "grid_xt")
    assert opened["v"].dims == ("tile", "pfull", "grid_yt", "grid_x")
    assert opened["tsea"].dims == ("tile", "grid_yt", "grid_xt")
    assert opened["T"].units == "K"

    back, phis_back = state_from_restarts(opened, ptop)
    np.testing.assert_allclose(back.delp, state.delp, rtol=1e-6)
    np.testing.assert_allclose(back.pt, state.pt, rtol=1e-5)
    np.testing.assert_allclose(back.u, state.u, rtol=1e-6)
    np.testing.assert_allclose(back.v, state.v, rtol=1e-6)
    np.testing.assert_allclose(back.w, state.w, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(back.delz, state.delz, rtol=1e-6)
    np.testing.assert_allclose(back.q, state.q, rtol=1e-6)
    np.testing.assert_allclose(phis_back, phis, rtol=1e-6)

    assert read_coupler_res(os.path.join(rundir, "INPUT", "coupler.res")) == t0


def test_timestamped_intermediate_restarts(tmp_path):
    n, nz, ptop = 6, 4, 300.0
    state = _synth_state(n, nz)
    fields = restarts_from_state(state, np.zeros((6, n, n)), ptop)
    rundir = str(tmp_path / "run")
    write_restarts(fields, rundir, subdir="RESTART")
    # rename to the timestamped intermediate-restart layout
    rdir = os.path.join(rundir, "RESTART")
    for f in os.listdir(rdir):
        if f.endswith(".nc"):
            os.rename(
                os.path.join(rdir, f),
                os.path.join(rdir, "20160801.060000." + f),
            )
    prefixes = {p for p, _, _, _ in yield_restart_files(rundir)}
    assert prefixes == {os.path.join("RESTART", "20160801.060000")}
    opened = open_restarts(rundir)
    (only,) = opened
    np.testing.assert_allclose(
        opened[only]["delp"].values, np.asarray(state.delp, np.float64),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_dycore_runs_from_ingested_restart(tmp_path):
    """Init-from-restart drives the dycore: ingested state steps without
    blowing up and conserves mass (the nudging.py:111-133 use case)."""
    import jax.numpy as jnp

    from fv3net_tpu.dycore.hydro import make_dycore_stepper
    from fv3net_tpu.grid import CubedSphereGrid

    n, nz, ptop = 12, 5, 300.0
    g = CubedSphereGrid.make(n, halo=3)
    from fv3net_tpu.dycore.hydro import DycoreState, hybrid_coefficients

    ak, bk = hybrid_coefficients(nz, ptop)
    pe = np.asarray(ak)[:, None, None] + np.asarray(bk)[:, None, None] * 1e5
    delp = np.broadcast_to(pe[1:] - pe[:-1], (6, nz, n, n)).astype(np.float32)
    from fv3net_tpu.constants import KAPPA, REFERENCE_SURFACE_PRESSURE

    pik = (pe / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    pt = np.broadcast_to(
        285.0 / (0.5 * (pik[1:] + pik[:-1])), (6, nz, n, n)
    ).astype(np.float32)
    state = DycoreState(
        delp=delp.copy(), pt=pt.copy(),
        u=np.zeros((6, nz, n + 1, n), np.float32),
        v=np.zeros((6, nz, n, n + 1), np.float32),
        q=np.full((1, 6, nz, n, n), 1e-3, np.float32),
    )
    from fv3net_tpu.dycore.hydro import add_nonhydrostatic_fields

    state = add_nonhydrostatic_fields(
        type(state)(*[None if x is None else jnp.asarray(x) for x in state]),
        ptop,
    )
    rundir = str(tmp_path / "run")
    write_restarts(
        restarts_from_state(state, np.zeros((6, n, n)), ptop),
        rundir, subdir="INPUT",
    )

    ingested, phis = state_from_restarts(open_restarts(rundir)["INPUT"], ptop)
    run, _, _ = make_dycore_stepper(
        g, nz, dt_atmos=300.0, k_split=1, n_split=2, dtype=jnp.float32
    )
    st = type(ingested)(
        *[None if x is None else jnp.asarray(x) for x in ingested]
    )
    out = run(st, jnp.asarray(phis), 2)
    assert bool(jnp.isfinite(out.delp).all())
    area = np.asarray(g.area[g.interior])[:, None]
    np.testing.assert_allclose(
        float((np.asarray(out.delp) * area).sum()),
        float((np.asarray(st.delp) * area).sum()),
        rtol=1e-6,
    )


def test_coupler_res_roundtrip(tmp_path):
    p = str(tmp_path / "coupler.res")
    t = datetime.datetime(2020, 1, 15, 12, 30, 45)
    write_coupler_res(p, t, initial_time=datetime.datetime(2020, 1, 1))
    assert read_coupler_res(p) == t
