"""Segmented-run create/append/resume integration test -- the in-process
analog of the reference's runfv3 create/append regression
(workflows/prognostic_c48_run/tests/test_regression.py:348-353)."""

import datetime
import os

import numpy as np
import pytest

from fv3net_tpu.runtime import segmented_run


@pytest.mark.slow
def test_create_append_resume(tmp_path):
    url = str(tmp_path / "run1")
    config = {
        "namelist": {
            "npx": 7,
            "npz": 6,
            "dt_atmos": 600.0,
            "n_split": 4,
            "segment_steps": 2,
            "dtype": "float64",
        },
        "diagnostics": [
            {
                "name": "diags.zarr",
                "variables": ["water_vapor_path"],
                "times": {"kind": "every"},
            }
        ],
    }
    segmented_run.create(url, config)
    assert os.path.exists(os.path.join(url, "fv3config.yml"))

    rc = segmented_run.append(url)
    assert rc == 0
    seg0 = os.path.join(url, "artifacts", "0000")
    assert os.path.isdir(os.path.join(seg0, "RESTART"))
    assert os.path.isdir(os.path.join(seg0, "diags.zarr"))

    # append resumes from segment 0's restart
    from fv3net_tpu import wrapper

    rc = segmented_run.append(url)
    assert rc == 0
    seg1 = os.path.join(url, "artifacts", "0001")
    assert os.path.isdir(os.path.join(seg1, "RESTART"))
    # time advanced by 2 segments x 2 steps x 600 s
    model = wrapper.get_model()
    t0 = datetime.datetime.fromisoformat(
        wrapper.ModelConfig().initial_time
    )
    assert (model.time - t0).total_seconds() == 4 * 600.0

    # diagnostics zarr grew along time
    from fv3net_tpu.io.zarr_lite import ZarrLiteStore

    store = ZarrLiteStore(os.path.join(seg1, "diags.zarr"))
    wvp = store.read("water_vapor_path")
    assert wvp.shape[0] == 2
    assert np.isfinite(wvp).all()


@pytest.mark.slow
def test_runfv3_cli_run_native_and_parse_logs(tmp_path, capsys):
    """The `runfv3` CLI surface (segmented_run/cli.py:31-80 role):
    run-native sets up + runs a segment; parse-logs turns the
    segment's scalars.jsonl into JSON."""
    import json
    import yaml

    from fv3net_tpu.runtime.cli import main

    cfg = {
        "namelist": {
            "npx": 7, "npz": 6, "dt_atmos": 600.0, "n_split": 4,
            "segment_steps": 1, "dtype": "float64",
        },
        "diagnostics": [],
    }
    cfg_path = tmp_path / "fv3config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    rundir = str(tmp_path / "native")
    assert main(["run-native", str(cfg_path), rundir]) == 0
    seg = os.path.join(rundir, "artifacts", "0000")
    assert os.path.isdir(os.path.join(seg, "RESTART"))
    scalars = os.path.join(seg, "scalars.jsonl")
    assert os.path.exists(scalars)
    capsys.readouterr()
    assert main(["parse-logs", scalars]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert any(len(v) >= 1 for v in doc.values())
