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
        # state values win over registered derivations: a variable the
        # model already owns (e.g. "surface_pressure") must not be
        # shadowed by a recomputation (vcm.DerivedMapping likewise
        # falls back to the dataset first)
        try:
            return self._mapper[key]
        except KeyError:
            if key in self._register:
                return self._register[key](self)
            raise

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


# --- the vcm.DerivedMapping registered-variable set -------------------
# (vcm/derived_mapping.py:8-38 registers ~28 names; those expressible
# from this framework's canonical state are reproduced here)


def _delp(dm):
    return dm[names.DELP]


@DerivedMapping.register("pressure")
def _pressure(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import pressure_at_midpoint_log

    delp = _delp(dm)
    return Quantity(
        np.asarray(pressure_at_midpoint_log(delp.values)),
        delp.dims, "Pa",
    )


@DerivedMapping.register("pressure_at_interface")
def _pressure_interface(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import pressure_interface

    delp = _delp(dm)
    # the interface axis has nz+1 entries: give it its own dim name
    dims = tuple(
        "z_interface" if d == "z" else d for d in delp.dims
    )
    return Quantity(
        np.asarray(pressure_interface(delp.values)), dims, "Pa"
    )


@DerivedMapping.register("surface_pressure")
def _surface_pressure(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import surface_pressure_from_delp

    delp = _delp(dm)
    ps = np.asarray(surface_pressure_from_delp(delp.values))
    dims = delp.dims[:-3] + delp.dims[-2:]
    return Quantity(ps, dims, "Pa")


@DerivedMapping.register("relative_humidity")
def _relative_humidity(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import (
        pressure_at_midpoint_log,
        relative_humidity_from_pressure,
    )

    T = dm[names.TEMP]
    q = dm[names.SPHUM]
    p = pressure_at_midpoint_log(_delp(dm).values)
    rh = np.asarray(
        relative_humidity_from_pressure(T.values, q.values, p)
    )
    return Quantity(rh, T.dims, "")


@DerivedMapping.register("potential_temperature")
def _theta(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import (
        potential_temperature,
        pressure_at_midpoint_log,
    )

    T = dm[names.TEMP]
    p = pressure_at_midpoint_log(_delp(dm).values)
    return Quantity(
        np.asarray(potential_temperature(p, T.values)), T.dims, "K"
    )


@DerivedMapping.register("virtual_temperature")
def _tv(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import virtual_temperature

    T = dm[names.TEMP]
    q = dm[names.SPHUM]
    return Quantity(
        np.asarray(virtual_temperature(T.values, q.values)), T.dims,
        "K",
    )


@DerivedMapping.register("total_water")
def _total_water(dm: DerivedMapping) -> Quantity:
    q = dm[names.SPHUM]
    qc = dm[names.CLOUD]
    return Quantity(q.values + qc.values, q.dims, "kg/kg")


@DerivedMapping.register("column_integrated_water")
def _ciw(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import mass_integrate

    tw = dm["total_water"]
    delp = _delp(dm)
    col = np.asarray(mass_integrate(tw.values, delp.values))
    dims = delp.dims[:-3] + delp.dims[-2:]
    return Quantity(col, dims, "kg/m**2")


@DerivedMapping.register("water_vapor_path")
def _wvp(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import mass_integrate

    q = dm[names.SPHUM]
    delp = _delp(dm)
    col = np.asarray(mass_integrate(q.values, delp.values))
    dims = delp.dims[:-3] + delp.dims[-2:]
    return Quantity(col, dims, "kg/m**2")


@DerivedMapping.register("wind_speed")
def _wind_speed(dm: DerivedMapping) -> Quantity:
    u = dm[names.EASTWARD_WIND]
    v = dm[names.NORTHWARD_WIND]
    return Quantity(
        np.sqrt(u.values ** 2 + v.values ** 2), u.dims, "m/s"
    )


@DerivedMapping.register("is_land")
def _is_land(dm: DerivedMapping) -> Quantity:
    m = dm[names.MASK]
    return Quantity(
        np.asarray(np.rint(m.values) == 1.0), m.dims, ""
    )


@DerivedMapping.register("is_sea")
def _is_sea(dm: DerivedMapping) -> Quantity:
    m = dm[names.MASK]
    return Quantity(
        np.asarray(np.rint(m.values) == 0.0), m.dims, ""
    )


@DerivedMapping.register("is_sea_ice")
def _is_sea_ice(dm: DerivedMapping) -> Quantity:
    m = dm[names.MASK]
    return Quantity(
        np.asarray(np.rint(m.values) == 2.0), m.dims, ""
    )


@DerivedMapping.register("net_heating_due_to_machine_learning")
def _net_heating_ml(dm: DerivedMapping) -> Quantity:
    from ..constants import CP_AIR
    from ..utils.thermo import mass_integrate

    dq1 = dm["dQ1"]
    delp = _delp(dm)
    col = CP_AIR * np.asarray(
        mass_integrate(dq1.values, delp.values)
    )
    dims = delp.dims[:-3] + delp.dims[-2:]
    return Quantity(col, dims, "W/m**2")


@DerivedMapping.register("net_moistening_due_to_machine_learning")
def _net_moistening_ml(dm: DerivedMapping) -> Quantity:
    from ..utils.thermo import mass_integrate

    dq2 = dm["dQ2"]
    delp = _delp(dm)
    col = np.asarray(mass_integrate(dq2.values, delp.values))
    dims = delp.dims[:-3] + delp.dims[-2:]
    return Quantity(col, dims, "kg/m**2/s")


@DerivedMapping.register("latent_heat_flux_from_evaporation")
def _lhf_from_evap(dm: DerivedMapping) -> Quantity:
    from ..constants import LATENT_HEAT_VAPORIZATION

    e = dm["evaporation"]
    return Quantity(
        e.values * LATENT_HEAT_VAPORIZATION, e.dims, "W/m**2"
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
