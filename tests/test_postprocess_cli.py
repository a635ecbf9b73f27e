"""Post-process rechunk/encode pass + the log-viewer / single-run
diagnostics subcommands (VERDICT r4 item 8 parity tails; reference
workflows/post_process_run/fv3post/post_process.py:49-54 and
workflows/diagnostics/.../prognostic_run/cli.py:16-33)."""

import json
import os

import numpy as np

from fv3net_tpu.io.zarr_lite import (
    ZarrLiteStore,
    open_zarr_lite,
    rechunk_store,
)


def test_rechunk_round_trip(tmp_path):
    src = ZarrLiteStore(str(tmp_path / "src.zarr"))
    rng = np.random.RandomState(0)
    a = rng.randn(7, 6, 4, 4)  # f64, per-step time chunks
    src.create_array(
        "temp", a.shape, (1, 6, 4, 4), a.dtype,
        dims=("time", "tile", "y", "x"), attrs={"units": "K"},
    )
    src.write_full("temp", a)
    b = (rng.rand(7) > 0.5).astype(np.int64)
    src.create_array("flag", b.shape, (1,), b.dtype, dims=("time",))
    src.write_full("flag", b)

    dst = rechunk_store(
        str(tmp_path / "src.zarr"), str(tmp_path / "dst.zarr"),
        cast="float32", time_chunk=4,
    )
    # values survive (to f32), chunking changed, dims/attrs kept
    out = dst.read("temp")
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, a.astype(np.float32))
    assert dst._meta("temp")["chunks"][0] == 4
    assert dst.attrs("temp")["units"] == "K"
    assert dst.attrs("temp")["_ARRAY_DIMENSIONS"] == [
        "time", "tile", "y", "x",
    ]
    # non-float arrays keep their dtype
    assert dst.read("flag").dtype == np.int64
    np.testing.assert_array_equal(dst.read("flag"), b)


def test_rechunk_preserves_time_coordinate_dtype(tmp_path):
    """Dimension coordinates must NOT be f32-encoded: float64 epoch
    timestamps quantize to ~128 s at f32 (round-5 review finding)."""
    src = ZarrLiteStore(str(tmp_path / "src.zarr"))
    t = 1.5e9 + 900.0 * np.arange(5, dtype=np.float64)
    src.create_array("time", t.shape, (1,), t.dtype, dims=("time",))
    src.write_full("time", t)
    d = np.random.RandomState(0).randn(5, 4)
    src.create_array(
        "x", d.shape, (1, 4), d.dtype, dims=("time", "col")
    )
    src.write_full("x", d)
    dst = rechunk_store(
        str(tmp_path / "src.zarr"), str(tmp_path / "dst.zarr"),
        cast="float32", time_chunk=5,
    )
    assert dst.read("time").dtype == np.float64
    np.testing.assert_array_equal(dst.read("time"), t)
    assert dst.read("x").dtype == np.float32


def test_post_process_segment(tmp_path):
    from fv3net_tpu.runtime.segmented_run import post_process_segment

    seg = tmp_path / "0000"
    seg.mkdir()
    z = ZarrLiteStore(str(seg / "diags.zarr"))
    a = np.arange(24, dtype=np.float64).reshape(6, 2, 2)
    z.create_array("x", a.shape, (1, 2, 2), a.dtype)
    z.write_full("x", a)
    post_process_segment(str(seg), time_chunk=8)
    z2 = open_zarr_lite(str(seg / "diags.zarr"))
    out = z2.read("x")
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, a)
    assert z2._meta("x")["chunks"][0] == 6  # clipped to extent


def test_log_viewer_cmd(tmp_path):
    from fv3net_tpu.diagnostics.cli import log_viewer_cmd
    from fv3net_tpu.runtime.timing import ScalarSink

    seg = tmp_path / "run" / "segments" / "0000"
    os.makedirs(seg)
    sink = ScalarSink(str(seg))
    for step in range(5):
        sink.write(step, f"t{step}", {"mass": 1.0 + step, "te": 2.0})
    sink.close()
    with open(seg / "timing.json", "w") as f:
        json.dump(
            {"dynamics": {"min": 0.1, "max": 0.2, "mean": 0.15}}, f
        )
    out = log_viewer_cmd(
        str(tmp_path / "run"), str(tmp_path / "out")
    )
    html = open(out).read()
    assert "mass" in html and "dynamics" in html
    assert "svg" in html  # inline time-series actually rendered


def test_single_run_cmd(tmp_path):
    from fv3net_tpu.diagnostics.cli import single_run_cmd

    rng = np.random.RandomState(1)
    z = ZarrLiteStore(str(tmp_path / "state_output.zarr"))
    t_in = 280.0 + rng.randn(4, 8)
    t_after = t_in + 0.1 * rng.randn(4, 8)
    t_out = t_after + 0.01 * rng.randn(4, 8)
    for name, arr in (
        ("air_temperature_input", t_in),
        ("air_temperature_after_precpd", t_after),
        ("air_temperature_output", t_out),
    ):
        z.create_array(name, arr.shape, (1, 8), arr.dtype)
        z.write_full(name, arr)
    m = single_run_cmd(str(tmp_path), str(tmp_path / "out"))
    assert m["air_temperature/tendency_rms"] > 0
    assert m["air_temperature/emulator_r2"] > 0.9
    assert os.path.exists(tmp_path / "out" / "single_run.json")


def test_cli_help_lists_new_subcommands(capsys):
    import pytest

    from fv3net_tpu.diagnostics.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("log-viewer", "single-run", "shell"):
        assert cmd in out
