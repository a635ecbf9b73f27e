"""Prognostic-run diagnostics computation
(workflows/diagnostics/.../prognostic_run/compute.py equivalent).

Registered diagnostic groups reduce a run's zarr output to summary
fields and scalar metrics: global/zonal means, RMSE vs a baseline, bias,
time series -- the same families the reference registers (~24 groups).
Input is a dict of numpy arrays read from a run's zarr-lite diagnostics
plus the grid area.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .registry import Registry

DIAGNOSTICS_REGISTRY = Registry()
METRICS_REGISTRY = Registry()


def _weighted_mean(x, w, axes):
    return (x * w).sum(axis=axes) / np.broadcast_to(w, x.shape).sum(
        axis=axes
    )


@DIAGNOSTICS_REGISTRY.register("global_mean_timeseries")
def global_mean_timeseries(run: Mapping, area) -> Dict:
    """Area-weighted global mean of each [time, tile, y, x] variable."""
    out = {}
    for name, arr in run.items():
        if arr.ndim == 4:  # [time, tile, y, x]
            out[name] = _weighted_mean(arr, area[None], (1, 2, 3))
    return out


@DIAGNOSTICS_REGISTRY.register("time_mean")
def time_mean_maps(run: Mapping, area) -> Dict:
    out = {}
    for name, arr in run.items():
        if arr.ndim >= 3:
            out[name] = arr.mean(axis=0)
    return out


@DIAGNOSTICS_REGISTRY.register("zonal_mean")
def zonal_mean(run: Mapping, area, lat=None) -> Dict:
    """Approximate zonal average on latitude bands
    (vcm zonal_average_approximate semantics)."""
    if lat is None:
        return {}
    bands = np.linspace(-90, 90, 19)
    idx = np.digitize(np.rad2deg(lat), bands)
    out = {}
    for name, arr in run.items():
        if arr.ndim == 4:
            prof = np.zeros((arr.shape[0], len(bands)))
            for b in range(len(bands)):
                m = idx == b
                if m.any():
                    prof[:, b] = arr[:, m].mean(axis=1)
            out[name] = prof
    return out


@METRICS_REGISTRY.register("rmse_vs_initial")
def rmse_vs_initial(run: Mapping, area) -> Dict:
    out = {}
    for name, arr in run.items():
        if arr.ndim == 4:
            err = arr - arr[:1]
            out[name] = float(
                np.sqrt(_weighted_mean(err ** 2, area[None],
                                       (1, 2, 3)).mean())
            )
    return out


@METRICS_REGISTRY.register("drift")
def drift(run: Mapping, area) -> Dict:
    out = {}
    for name, arr in run.items():
        if arr.ndim == 4 and arr.shape[0] > 1:
            gm = _weighted_mean(arr, area[None], (1, 2, 3))
            out[name] = float(gm[-1] - gm[0])
    return out


def load_run(path: str) -> Dict[str, np.ndarray]:
    """Read all arrays of a run's diagnostics store."""
    from ..io.zarr_lite import ZarrLiteStore

    store = ZarrLiteStore(path)
    return {name: store.read(name) for name in store.arrays()}


def compute_diagnostics(run_path: str, area, lat=None):
    """The `prognostic_run_diags compute` entry
    (prognostic_run/cli.py:16)."""
    run = load_run(run_path)
    run.pop("time", None)
    diags = DIAGNOSTICS_REGISTRY.compute(run, area)
    metrics = METRICS_REGISTRY.compute(run, area)
    return diags, metrics
