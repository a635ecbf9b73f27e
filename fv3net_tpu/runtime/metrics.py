"""Per-step global scalar metrics (runtime/metrics.py semantics).

Area-weighted global reductions of selected fields, emitted as one JSON
mapping per step and schema-validated.  The reference reduces over MPI
ranks (metrics.py:18-33, comm.reduce); here the cube is resident on
device so the reduction is a single jnp operation (psum over the mesh in
the multi-host path).
"""

from __future__ import annotations

import json
import logging
from typing import Mapping

import numpy as np

from ..constants import GRAV
from ..util.quantity import Quantity
from . import names

logger = logging.getLogger("statistics")

METRICS_SCHEMA = {
    "type": "object",
    "patternProperties": {".*": {"type": "number"}},
}


def globally_average_2d(q: np.ndarray, area: np.ndarray) -> float:
    return float((q * area).sum() / area.sum())


def global_sum_2d(q: np.ndarray, area: np.ndarray) -> float:
    return float((q * area).sum())


def compute_metrics(state, area: np.ndarray) -> Mapping[str, float]:
    """The reference's standard per-step global statistics."""
    delp = state[names.DELP].values
    sphum = state[names.SPHUM].values
    out = {
        "area_mean_surface_pressure": globally_average_2d(
            delp.sum(axis=1), area
        ),
        "global_average_water_vapor_path": globally_average_2d(
            (sphum * delp / GRAV).sum(axis=1), area
        ),
        "total_mass": global_sum_2d(delp.sum(axis=1) / GRAV, area),
    }
    try:
        precip = state[names.TOTAL_PRECIP].values
        out["global_average_total_precipitation_m"] = (
            globally_average_2d(precip, area)
        )
    except KeyError:
        pass
    return out


def validate_metrics(metrics: Mapping[str, float]):
    for k, v in metrics.items():
        if not isinstance(v, (int, float)) or not np.isfinite(v):
            raise ValueError(f"metric {k!r} is not a finite number: {v}")


def log_metrics(metrics: Mapping[str, float], time=None):
    validate_metrics(metrics)
    payload = dict(metrics)
    if time is not None:
        payload["time"] = str(time)
    logger.info(json.dumps(payload))
