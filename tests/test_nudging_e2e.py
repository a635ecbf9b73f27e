"""End-to-end nudged-run call stack (SURVEY 3.3, VERDICT r2 item 5).

Reference-state plumbing: time-labeled coarsened-restart snapshot dirs
-> setup_get_reference_state (linear time interpolation,
runtime/nudging.py:80-133 + interpolate.py:18-63) -> PureNudger inside
the TimeLoop -> per-step `{var}_tendency_due_to_nudging` diagnostics
written to zarr -> open_nudge_to_fine -> a training batch with dQ1.
"""

import datetime

import numpy as np
import pytest

from fv3net_tpu import wrapper
from fv3net_tpu.data import batches_from_mapper, open_nudge_to_fine
from fv3net_tpu.io.restarts import write_restarts
from fv3net_tpu.io.zarr_lite import ZarrLiteStore
from fv3net_tpu.runtime import names
from fv3net_tpu.runtime.derived_state import DerivedModelState
from fv3net_tpu.runtime.loop import TimeLoop
from fv3net_tpu.runtime.nudging import (
    label_to_time,
    nudger_from_config,
    setup_get_reference_state,
    time_to_label,
)
from fv3net_tpu.runtime.steppers import NudgingConfig
from fv3net_tpu.util.quantity import Quantity


@pytest.fixture(scope="module")
def model():
    cfg = wrapper.ModelConfig(
        npx=7, npz=8, dt_atmos=600.0, n_split=4, dtype="float64"
    )
    wrapper.initialize(cfg)
    return wrapper.get_model()


def _write_snapshot(base, time, temp, sphum):
    """One coarsened-restart snapshot dir <base>/<label>/ with the
    restart-file variable names (T, sphum)."""
    label = time_to_label(time)
    dims = ("tile", "z", "y", "x")
    write_restarts(
        {
            "T": Quantity(np.asarray(temp), dims, "K"),
            "sphum": Quantity(np.asarray(sphum), dims, "kg/kg"),
        },
        str(base),
        subdir=label,
    )
    return label


def test_label_time_roundtrip():
    t = datetime.datetime(2016, 8, 1, 0, 15, 0)
    assert label_to_time(time_to_label(t)) == t


def test_reference_state_time_interpolation(model, tmp_path):
    st = wrapper.get_state([names.TEMP, names.SPHUM])
    t0_arr = st[names.TEMP].values
    q_arr = st[names.SPHUM].values
    t0 = wrapper.get_model().time
    _write_snapshot(tmp_path, t0, t0_arr + 2.0, q_arr)
    _write_snapshot(
        tmp_path, t0 + datetime.timedelta(minutes=30), t0_arr + 4.0,
        q_arr,
    )
    cfg = NudgingConfig(
        timescale_hours={names.TEMP: 2.0, names.SPHUM: 2.0},
        restarts_path=str(tmp_path),
    )
    get_ref = setup_get_reference_state(cfg)
    # exact snapshot
    ref = get_ref(t0)
    np.testing.assert_allclose(ref[names.TEMP].values, t0_arr + 2.0)
    # midpoint: linear interpolation
    ref = get_ref(t0 + datetime.timedelta(minutes=15))
    np.testing.assert_allclose(
        ref[names.TEMP].values, t0_arr + 3.0, rtol=1e-12
    )
    # outside the window raises
    with pytest.raises(ValueError):
        get_ref(t0 - datetime.timedelta(hours=1))


@pytest.mark.slow
def test_nudged_timeloop_roundtrips_into_training_batch(
    model, tmp_path
):
    run_dir = tmp_path / "nudged_run"
    run_dir.mkdir()
    ref_dir = tmp_path / "reference"
    ref_dir.mkdir()

    st = wrapper.get_state([names.TEMP, names.SPHUM])
    t_arr = st[names.TEMP].values
    q_arr = st[names.SPHUM].values
    t0 = wrapper.get_model().time
    # constant +3 K / +1e-4 target over the covered window
    for minutes in (0, 60):
        _write_snapshot(
            ref_dir, t0 + datetime.timedelta(minutes=minutes),
            t_arr + 3.0, q_arr + 1e-4,
        )

    cfg = NudgingConfig(
        timescale_hours={names.TEMP: 2.0, names.SPHUM: 2.0},
        restarts_path=str(ref_dir),
    )
    nudger = nudger_from_config(cfg)
    state = DerivedModelState(wrapper)
    loop = TimeLoop(
        wrapper, state, dt=600.0, postphysics_stepper=nudger, n_steps=2
    )

    # run, capturing the two zarr stores a nudged run ships
    state_store = ZarrLiteStore(str(run_dir / "state_after_timestep.zarr"))
    tend_store = ZarrLiteStore(str(run_dir / "nudging_tendencies.zarr"))
    state_vars = [names.TEMP, names.SPHUM]
    tend_vars = [
        f"{names.TEMP}_tendency_due_to_nudging",
        f"{names.SPHUM}_tendency_due_to_nudging",
    ]
    times = []
    rows = {v: [] for v in state_vars + tend_vars}
    for time, diags in loop:
        times.append(time_to_label(time))
        for v in state_vars:
            rows[v].append(state[v].values.copy())
        for v in tend_vars:
            assert v in diags, sorted(diags)
            rows[v].append(np.asarray(diags[v].data))

    dims = ("time", "tile", "z", "y", "x")
    for store, group in (
        (state_store, state_vars),
        (tend_store, tend_vars),
    ):
        for v in group:
            arr = np.stack(rows[v]).astype(np.float32)
            store.create_array(
                v, shape=arr.shape, chunks=(1,) + arr.shape[1:],
                dtype=np.float32, dims=dims,
            )
            store.write_full(v, arr)

    # tendencies point toward the reference with ~1/tau magnitude
    # (dynamics/physics move T between observation and nudging, so
    # only the sign/scale is asserted, not the exact value)
    tend0 = rows[tend_vars[0]][0]
    assert np.nanmean(tend0) > 0  # reference is warmer
    assert np.nanmax(np.abs(tend0)) < 10.0 / 7200.0

    # --- the loaders contract: open_nudge_to_fine -> training batch --
    mapper = open_nudge_to_fine(str(run_dir))
    assert len(mapper) == 2
    sample = mapper[sorted(mapper.keys())[0]]
    assert "dQ1" in sample and "dQ2" in sample
    np.testing.assert_allclose(
        np.asarray(sample["dQ1"].data), tend0.astype(np.float32)
    )

    batches = batches_from_mapper(
        "open_nudge_to_fine", {"url": str(run_dir)},
        variable_names=[names.TEMP, "dQ1", "dQ2"],
    )
    assert len(batches) == 2
    assert set(batches[0]) == {names.TEMP, "dQ1", "dQ2"}
