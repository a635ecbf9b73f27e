"""Mapper-layer tests (loaders parity: _nudged.py, _fine_res.py,
_config.py, _batch.py)."""

import numpy as np
import pytest

from fv3net_tpu.data import (
    BatchesFromMapperConfig,
    MapperConfig,
    batches_from_mapper,
    mapper_functions,
    open_fine_resolution,
    open_nudge_to_fine,
    open_nudge_to_fine_multiple_datasets,
)
from fv3net_tpu.io.zarr_lite import ZarrLiteStore

NT, NZ, N = 3, 4, 6
DIMS = ("time", "tile", "z", "y", "x")


def _write_store(path, variables, seed=0):
    store = ZarrLiteStore(str(path))
    rng = np.random.RandomState(seed)
    shape = (NT, 6, NZ, N, N)
    for v in variables:
        store.create_array(
            v, shape=shape, chunks=(1,) + shape[1:],
            dtype=np.float32, dims=DIMS,
        )
        store.write_full(v, rng.randn(*shape).astype(np.float32))
    return store


@pytest.fixture()
def nudged_run(tmp_path):
    run = tmp_path / "nudged_run"
    run.mkdir()
    _write_store(
        run / "state_after_timestep.zarr",
        ["air_temperature", "specific_humidity"], seed=1,
    )
    _write_store(
        run / "nudging_tendencies.zarr",
        ["air_temperature_tendency_due_to_nudging",
         "specific_humidity_tendency_due_to_nudging"], seed=2,
    )
    return str(run)


def test_open_nudge_to_fine_renames(nudged_run):
    mapper = open_nudge_to_fine(nudged_run)
    assert len(mapper) == NT
    state = mapper[sorted(mapper.keys())[0]]
    assert "dQ1" in state and "dQ2" in state
    assert "air_temperature" in state
    assert state["dQ1"].shape == (6, NZ, N, N)


def test_open_nudge_to_fine_multiple(nudged_run):
    mapper = open_nudge_to_fine_multiple_datasets(
        [nudged_run, nudged_run]
    )
    assert len(mapper) == 2 * NT


def test_mapper_registry_and_config(nudged_run):
    assert "open_nudge_to_fine" in mapper_functions
    cfg = MapperConfig("open_nudge_to_fine", {"url": nudged_run})
    mapper = cfg.open_mapper()
    assert len(mapper) == NT


def test_batches_from_mapper(nudged_run):
    batches = batches_from_mapper(
        "open_nudge_to_fine", {"url": nudged_run},
        variable_names=["air_temperature", "dQ1"],
    )
    assert len(batches) == NT
    assert set(batches[0]) == {"air_temperature", "dQ1"}


def test_batches_from_mapper_multi_timestep(nudged_run):
    batches = BatchesFromMapperConfig(
        MapperConfig("open_nudge_to_fine", {"url": nudged_run}),
        variable_names=["dQ1"],
        timesteps_per_batch=3,
    ).load_batches()
    assert len(batches) == 1
    # 3 timesteps concatenated along the tile axis
    assert batches[0]["dQ1"].shape == (18, NZ, N, N)


def test_open_fine_resolution_apparent_sources(tmp_path):
    path = tmp_path / "budget.zarr"
    _write_store(
        path,
        [
            "T_tendency_due_to_dynamics_fine",
            "T_tendency_due_to_dynamics_coarse",
            "T_tendency_due_to_physics_fine",
            "sphum_tendency_due_to_dynamics_fine",
            "sphum_tendency_due_to_dynamics_coarse",
            "sphum_tendency_due_to_physics_fine",
        ],
        seed=3,
    )
    mapper = open_fine_resolution(str(path))
    state = mapper[sorted(mapper.keys())[0]]
    q1 = state["Q1"].values
    expected = (
        state["T_tendency_due_to_dynamics_fine"].values
        - state["T_tendency_due_to_dynamics_coarse"].values
        + state["T_tendency_due_to_physics_fine"].values
    )
    np.testing.assert_allclose(q1, expected)
    assert "Q2" in state


def test_shuffled_batches_deterministic(nudged_run):
    b1 = BatchesFromMapperConfig(
        MapperConfig("open_nudge_to_fine", {"url": nudged_run}),
        variable_names=["dQ1"], shuffle_seed=7,
    ).load_batches()
    b2 = BatchesFromMapperConfig(
        MapperConfig("open_nudge_to_fine", {"url": nudged_run}),
        variable_names=["dQ1"], shuffle_seed=7,
    ).load_batches()
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["dQ1"].values, y["dQ1"].values)
