"""Named-array state container (pace.util.Quantity equivalent).

The reference couples everything through xarray DataArrays / pace.util
Quantities keyed by canonical names (runtime/derived_state.py:212,
pace.util).  Neither xarray nor pace is in this image, so the framework
carries its own minimal container: a Quantity is an array + dims + units
+ attrs, and a State is a plain dict of name -> Quantity.  Arrays may be
numpy or JAX; device arrays stay on device until `.values` is read.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Tuple

import numpy as np


@dataclasses.dataclass
class Quantity:
    data: Any  # np.ndarray or jax.Array
    dims: Tuple[str, ...]
    units: str = ""
    attrs: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        if len(self.dims) != getattr(self.data, "ndim", len(self.dims)):
            raise ValueError(
                f"dims {self.dims} do not match array rank "
                f"{self.data.ndim}"
            )

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def values(self) -> np.ndarray:
        return np.asarray(self.data)

    def with_data(self, data) -> "Quantity":
        return Quantity(data, self.dims, self.units, dict(self.attrs))

    def transpose(self, dims: Tuple[str, ...]) -> "Quantity":
        perm = tuple(self.dims.index(d) for d in dims)
        return Quantity(
            np.transpose(self.values, perm), dims, self.units,
            dict(self.attrs),
        )

    def __repr__(self):
        return (
            f"Quantity(dims={self.dims}, shape={self.shape}, "
            f"units={self.units!r})"
        )


State = Dict[str, Quantity]


def state_to_numpy(state: Mapping[str, Quantity]) -> State:
    return {k: v.with_data(v.values) for k, v in state.items()}
