"""Named data transforms (the vcm.data_transform role,
external/vcm/vcm/data_transform.py: a registry of named dataset ->
dataset transforms, composed from config by name — used by loaders and
offline diagnostics to derive training variables like Q1/Q2/Qm).

Transforms here act on Quantity-dict states; each is registered under
the reference's canonical name so loader configs port directly."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Mapping, Sequence

import numpy as np

from ..constants import CP_AIR, GRAV, LATENT_HEAT_VAPORIZATION, RDGAS
from ..util.quantity import Quantity

TRANSFORM_REGISTRY: Dict[str, "_Transform"] = {}


@dataclasses.dataclass
class _Transform:
    name: str
    inputs: Sequence[str]
    outputs: Sequence[str]
    fn: Callable


def register_transform(name: str, inputs: Sequence[str],
                       outputs: Sequence[str]):
    """(data_transform.py register pattern)"""

    def wrap(fn):
        TRANSFORM_REGISTRY[name] = _Transform(
            name, list(inputs), list(outputs), fn
        )
        return fn

    return wrap


def _q(template: Quantity, values, units=""):
    return Quantity(values, template.dims, units)


@register_transform(
    "Q1_from_dQ1_pQ1", ["dQ1", "pQ1"], ["Q1"]
)
def q1_from_parts(state):
    return {
        "Q1": _q(state["dQ1"],
                 state["dQ1"].values + state["pQ1"].values, "K/s")
    }


@register_transform(
    "Q2_from_dQ2_pQ2", ["dQ2", "pQ2"], ["Q2"]
)
def q2_from_parts(state):
    return {
        "Q2": _q(state["dQ2"],
                 state["dQ2"].values + state["pQ2"].values, "kg/kg/s")
    }


@register_transform(
    "Qm_from_Q1_Q2", ["Q1", "Q2"], ["Qm"]
)
def qm_from_q1_q2(state):
    """Moist static energy tendency from heating + moistening:
    Qm = (cp - Rd)*Q1 + Lv*Q2 (vcm.moist_static_energy_tendency,
    vcm/calc/thermo/local.py:317 — cv heat capacity, positive moisture
    term)."""
    qm = (
        (CP_AIR - RDGAS) * state["Q1"].values
        + LATENT_HEAT_VAPORIZATION * state["Q2"].values
    )
    return {"Qm": _q(state["Q1"], qm, "W/kg")}


@register_transform(
    "Q1_from_Qm_Q2", ["Qm", "Q2"], ["Q1"]
)
def q1_from_qm_q2(state):
    """Inverse of Qm_from_Q1_Q2 (vcm.temperature_tendency)."""
    q1 = (
        state["Qm"].values
        - LATENT_HEAT_VAPORIZATION * state["Q2"].values
    ) / (CP_AIR - RDGAS)
    return {"Q1": _q(state["Q2"], q1, "K/s")}


@register_transform(
    "implied_surface_precipitation_rate",
    ["Q2", "pressure_thickness_of_atmospheric_layer",
     "latent_heat_flux"],
    ["implied_surface_precipitation_rate"],
)
def implied_precip(state):
    """Budget-closure precipitation: rectified E - <Q2> where E is
    evaporation from latent heat flux (vcm/data_transform.py:281 via
    _tendency_to_implied_surface_downward_flux, rectify=True)."""
    q2 = state["Q2"].values
    delp = state["pressure_thickness_of_atmospheric_layer"].values
    lhf = state["latent_heat_flux"]
    evap = lhf.values / LATENT_HEAT_VAPORIZATION  # kg/m^2/s
    col = -(q2 * delp).sum(axis=-3) / GRAV  # kg/m^2/s  (-<Q2>)
    rate = np.maximum(col + evap, 0.0)
    return {
        "implied_surface_precipitation_rate": Quantity(
            rate, lhf.dims, "kg/m**2/s"
        )
    }


@register_transform(
    "relative_humidity", ["air_temperature", "specific_humidity",
                          "pressure"], ["relative_humidity"]
)
def rh_transform(state):
    from .thermo import relative_humidity_from_pressure

    rh = np.asarray(
        relative_humidity_from_pressure(
            state["air_temperature"].values,
            state["specific_humidity"].values,
            state["pressure"].values,
        )
    )
    return {
        "relative_humidity": _q(state["air_temperature"], rh, "")
    }


@dataclasses.dataclass
class DataTransform:
    """(data_transform.py:DataTransform): one named transform applied
    to a state dict."""

    name: str

    @property
    def input_variables(self) -> Sequence[str]:
        return TRANSFORM_REGISTRY[self.name].inputs

    @property
    def output_variables(self) -> Sequence[str]:
        return TRANSFORM_REGISTRY[self.name].outputs

    def apply(self, state: Mapping[str, Quantity]):
        out = dict(state)
        out.update(TRANSFORM_REGISTRY[self.name].fn(state))
        return out


@dataclasses.dataclass
class ChainedDataTransform:
    """(data_transform.py:ChainedDataTransform): apply in sequence."""

    transforms: List[DataTransform]

    @property
    def input_variables(self) -> Sequence[str]:
        produced, needed = set(), []
        for t in self.transforms:
            for v in t.input_variables:
                if v not in produced and v not in needed:
                    needed.append(v)
            produced.update(t.output_variables)
        return needed

    @property
    def output_variables(self) -> Sequence[str]:
        out = []
        for t in self.transforms:
            out.extend(t.output_variables)
        return out

    def apply(self, state):
        for t in self.transforms:
            state = t.apply(state)
        return state
