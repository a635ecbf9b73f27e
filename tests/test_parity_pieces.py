"""Small-parity-component tests: StepMetadata breadcrumbs
(artifacts/metadata.py), schema-driven synth fixtures (synth/core.py),
lat-lon wind rotation (vcm/cubedsphere/rotate.py), and the cross tile
layout (vcm/cubedsphere/cross.py)."""

import json

import numpy as np
import pytest

from fv3net_tpu.util.quantity import Quantity


def test_step_metadata_print_and_write(tmp_path, capsys):
    from fv3net_tpu.utils.artifacts import StepMetadata, log_fact_json

    md = StepMetadata(
        job_type="train", url="/tmp/out",
        dependencies={"data": "/tmp/data"}, args=["a", "b"],
    )
    md.print_json()
    out = capsys.readouterr().out.strip()
    doc = json.loads(out)
    assert doc["step_metadata"]["job_type"] == "train"
    assert doc["step_metadata"]["dependencies"] == {"data": "/tmp/data"}

    p = str(tmp_path / "meta.json")
    md.write(p)
    assert json.load(open(p))["step_metadata"]["url"] == "/tmp/out"

    log_fact_json({"train_time_seconds": 1.5})
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["json"]["train_time_seconds"] == 1.5
    assert rec["labels"]["kind"] == "metrics"


def test_train_cli_emits_step_metadata(tmp_path, capsys):
    import yaml

    from fv3net_tpu.fit.train import main

    tc = tmp_path / "train.yml"
    dc = tmp_path / "data.yml"
    yaml.safe_dump(
        {
            "model_type": "dense",
            "hyperparameters": {"epochs": 1, "width": 4, "depth": 1},
            "input_variables": ["a"],
            "output_variables": ["b"],
        },
        open(tc, "w"),
    )
    yaml.safe_dump(
        {
            "function": "synthetic_waves",
            "kwargs": {
                "variables": ["a", "b"], "n": 4, "nz": 2, "nbatch": 1,
            },
        },
        open(dc, "w"),
    )
    out = tmp_path / "model"
    main([str(tc), str(dc), str(out)])
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert any("step_metadata" in d for d in lines)


def test_synth_schema_roundtrip(tmp_path):
    from fv3net_tpu.data.synth import (
        Range, dump_schema, generate, load_schema,
        read_schema_from_state,
    )

    state = {
        "air_temperature": Quantity(
            np.zeros((2, 6, 3, 4, 4), np.float32),
            ("time", "tile", "z", "y", "x"), "K",
        ),
        "land_sea_mask": Quantity(
            np.zeros((6, 4, 4), np.float32), ("tile", "y", "x"), ""
        ),
        "z": Quantity(np.arange(3.0), ("z",), ""),
    }
    schema = read_schema_from_state(state)
    assert "z" in schema.coords
    assert schema.variables["air_temperature"].shape == (2, 6, 3, 4, 4)

    p = str(tmp_path / "schema.json")
    dump_schema(schema, p)
    loaded = load_schema(p)
    assert loaded.variables.keys() == schema.variables.keys()

    data = generate(
        loaded, ranges={"air_temperature": Range(200, 300)}, seed=1
    )
    t = data["air_temperature"]
    assert t.shape == (2, 6, 3, 4, 4)
    assert t.dims == ("time", "tile", "z", "y", "x")
    assert 200 <= t.values.min() and t.values.max() <= 300
    np.testing.assert_array_equal(data["z"].values, np.arange(3.0))
    # reproducible
    again = generate(loaded, ranges={"air_temperature": Range(200, 300)}, seed=1)
    np.testing.assert_array_equal(
        again["air_temperature"].values, t.values
    )


def test_synth_schema_from_zarr(tmp_path):
    from fv3net_tpu.data.synth import generate, read_schema_from_zarr
    from fv3net_tpu.io.zarr_lite import ZarrLiteStore

    store = ZarrLiteStore(str(tmp_path / "s.zarr"))
    store.create_array(
        "q", shape=(3, 6, 4, 4), chunks=(1, 6, 4, 4),
        dtype=np.float32, dims=("time", "tile", "y", "x"),
    )
    store.write_full("q", np.ones((3, 6, 4, 4), np.float32))
    schema = read_schema_from_zarr(str(tmp_path / "s.zarr"))
    assert schema.variables["q"].dims == ("time", "tile", "y", "x")
    data = generate(schema, seed=0)
    assert data["q"].shape == (3, 6, 4, 4)


def test_wind_rotation_recovers_solid_body():
    """A solid-body-rotation wind written in D-grid components rotates
    back to the right eastward/northward winds at cell centers."""
    from fv3net_tpu.grid import CubedSphereGrid
    from fv3net_tpu.utils.rotate import (
        center_and_rotate_xy_winds, wind_rotation_matrix,
    )

    g = CubedSphereGrid.make(12, halo=1)
    mat = wind_rotation_matrix(g)
    for k, v in mat.items():
        assert v.shape == (6, 12, 12), k
    # orthonormality where the grid is near-orthogonal: det != 0
    det = (
        mat["eastward_wind_u_coeff"] * mat["northward_wind_v_coeff"]
        - mat["eastward_wind_v_coeff"] * mat["northward_wind_u_coeff"]
    )
    assert (np.abs(det) > 0.2).all()

    # pure-eastward solid body wind projected onto the x/y directions,
    # staggered like D-grid u [tile, y+1, x] / v [tile, y, x+1]
    import fv3net_tpu.wrapper as W

    W.initialize(W.ModelConfig(npx=13, npz=3, physics_suite="none"))
    m = W.get_model()
    ua = np.broadcast_to(
        np.cos(m.lat)[None], (3, 6, 12, 12)
    ).transpose(1, 0, 2, 3)
    va = np.zeros_like(ua)
    du, dv = m.transform_agrid_winds_to_dgrid_winds(
        Quantity(ua, ("tile", "z", "y", "x"), "m/s"),
        Quantity(va, ("tile", "z", "y", "x"), "m/s"),
    )
    east, north = center_and_rotate_xy_winds(
        mat, np.asarray(du.data), np.asarray(dv.data)
    )
    # interior agreement (edges suffer from the centering stencil)
    sl = (slice(None), slice(None), slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(
        east[sl], ua.transpose(0, 1, 2, 3)[sl], atol=0.15
    )
    np.testing.assert_allclose(north[sl], 0.0, atol=0.15)
    W.cleanup()


def test_to_cross_layout():
    from fv3net_tpu.utils.cross import to_cross

    data = np.stack(
        [np.full((4, 4), t, float) for t in range(6)]
    )
    board = to_cross(data)
    assert board.shape == (12, 16)
    # six filled tiles, six empty board cells
    filled = np.isfinite(board).reshape(3, 4, 4, 4).any(axis=(1, 3))
    assert filled.sum() == 6
    # each tile value appears exactly once
    for t in range(6):
        assert (board == t).sum() == 16
    # leading dims broadcast
    batch = np.broadcast_to(data, (2, 6, 4, 4))
    assert to_cross(batch).shape == (2, 12, 16)


def test_batches_from_netcdf(tmp_path):
    """NCDirLoader-equivalent: one batch per classic NetCDF file
    (fv3fit/data/netcdf/load.py:115)."""
    from fv3net_tpu.data.batches import batches_from_netcdf
    from fv3net_tpu.io import netcdf3

    rng = np.random.RandomState(0)
    for i in range(3):
        ds = netcdf3.Dataset(
            {"sample": 8, "z": 4},
            {
                "a": netcdf3.Variable(
                    rng.rand(8, 4), ("sample", "z"), {"units": "K"}
                ),
                "b": netcdf3.Variable(rng.rand(8), ("sample",), {}),
            },
            {},
        )
        netcdf3.write(str(tmp_path / f"file{i}.nc"), ds)
    batches = batches_from_netcdf(
        str(tmp_path), ["a", "b"], shuffle=False, sort_files=True
    )
    assert len(batches) == 3
    assert batches[0]["a"].shape == (8, 4)
    assert batches[0]["a"].dims == ("sample", "z")
    assert batches[0]["a"].units == "K"
    two = batches_from_netcdf(str(tmp_path), ["a"], nfiles=2)
    assert len(two) == 2
