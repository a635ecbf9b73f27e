"""Model-state mapping with derived variables and mass-conserving set.

The DerivedFV3State/MergedState semantics of the reference
(runtime/derived_state.py:15-209): a dict-like view over the wrapper's
state with lazily-derived entries, a `time` property, plain item
assignment routed to set_state, and `update_mass_conserving` routed to
the wrapper's mass-conserving setter.  MergedState adds a Python-side
overlay for variables the model does not own.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, MutableMapping

import numpy as np

from ..util.quantity import Quantity
from . import names


class DerivedMapping:
    """Registry of derived variables computed on demand from a state
    mapping (vcm.DerivedMapping semantics, vcm/derived_mapping.py:8)."""

    _register: Dict[str, Callable] = {}

    def __init__(self, mapper):
        self._mapper = mapper

    @classmethod
    def register(cls, name: str):
        def wrap(fn):
            cls._register[name] = fn
            return fn

        return wrap

    def __getitem__(self, key: str) -> Quantity:
        if key in self._register:
            return self._register[key](self)
        return self._mapper[key]

    def keys(self):
        return set(self._mapper.keys()) | set(self._register)

    def dataset(self, keys):
        return {k: self[k] for k in keys}


@DerivedMapping.register("cos_zenith_angle")
def _cos_zenith(dm: DerivedMapping) -> Quantity:
    from ..utils.zenith import cos_zenith_angle

    time = dm["time"]
    lon = dm["longitude"]
    lat = dm["latitude"]
    cz = cos_zenith_angle(time, np.rad2deg(lon.values),
                          np.rad2deg(lat.values))
    return Quantity(cz, lon.dims, "")


@DerivedMapping.register("evaporation")
def _evaporation(dm: DerivedMapping) -> Quantity:
    lhf = dm["latent_heat_flux"]
    from ..constants import LATENT_HEAT_VAPORIZATION

    return Quantity(
        lhf.values / LATENT_HEAT_VAPORIZATION, lhf.dims, "kg/m**2/s"
    )


class DerivedModelState(MutableMapping):
    """Dict-like wrapper-state view (DerivedFV3State equivalent)."""

    def __init__(self, wrapper):
        self._wrapper = wrapper

    @property
    def time(self):
        return self._wrapper.get_state(["time"])["time"]

    def __getitem__(self, key: str) -> Quantity:
        if key == "time":
            return self.time
        return self._wrapper.get_state([key])[key]

    def __setitem__(self, key: str, value: Quantity):
        self._wrapper.set_state({key: value})

    def __delitem__(self, key):
        raise NotImplementedError

    def __iter__(self):
        yield from self.keys()

    def __len__(self):
        return len(list(self.keys()))

    def keys(self):
        props = (
            self._wrapper._properties.DYNAMICS_PROPERTIES
            + self._wrapper._properties.PHYSICS_PROPERTIES
        )
        return [p["name"] for p in props] + [
            names.SPHUM,
            names.CLOUD,
            names.X_WIND,
            names.Y_WIND,
            names.EASTWARD_WIND,
            names.NORTHWARD_WIND,
            names.AREA,
            "latitude",
            "longitude",
        ]

    def update(self, other: Mapping[str, Quantity]):  # type: ignore
        self._wrapper.set_state(dict(other))

    def update_mass_conserving(self, other: Mapping[str, Quantity]):
        self._wrapper.set_state_mass_conserving(dict(other))


class MergedState(MutableMapping):
    """Union of the model state and a Python-side overlay
    (runtime/derived_state.py:148)."""

    def __init__(self, model_state: DerivedModelState, overlay=None):
        self.model = model_state
        self.overlay: Dict[str, Quantity] = dict(overlay or {})

    @property
    def time(self):
        return self.model.time

    def __getitem__(self, key):
        if key in self.overlay:
            return self.overlay[key]
        return self.model[key]

    def __setitem__(self, key, value):
        try:
            self.model[key] = value
        except KeyError:
            self.overlay[key] = value

    def __delitem__(self, key):
        del self.overlay[key]

    def keys(self):
        return list(self.model.keys()) + list(self.overlay.keys())

    def __iter__(self):
        yield from self.keys()

    def __len__(self):
        return len(self.keys())

    def update_mass_conserving(self, other):
        model_part = {}
        for k, v in other.items():
            if k in self.model.keys():
                model_part[k] = v
            else:
                self.overlay[k] = v
        if model_part:
            self.model.update_mass_conserving(model_part)
