"""Fine-resolution budget ingredients with eddy-flux decomposition.

The reference's fine_res_budget workflow coarsens C3072/C384 state to
the target grid ON SURFACES OF CONSTANT PRESSURE and computes the
second moments whose coarse-grained residuals are the eddy fluxes that
enter Q1/Q2 (workflows/fine_res_budget/budget/budgets.py:
Grid.pressure_level_average, compute_second_moments, storage,
area_above_fine_surface; README.md:1-30).  This module provides the
same recipe over this framework's jnp/numpy arrays:

  * ``pressure_level_average``: vertical PPM regrid of a fine field to
    the (upsampled) coarse interface pressures, then area-weighted
    block averaging — the "coarsen on pressure surfaces" operator;
  * ``second_moments`` + ``eddy_flux``: bar(w T) - bar(w) bar(T) type
    decompositions (the resolved-vs-subgrid vertical flux split);
  * ``storage``: (end - begin)/dt tendencies;
  * ``exposed_area``: the area where the fine surface sits below the
    coarse pressure midpoint (terrain-intersection bookkeeping).

Fields are [tile, nz, y, x] (or [tile, y, x] for 2D); everything jits.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np

from ..ops.remap import ppm_remap
from .coarsen import block_coarsen, block_upsample, \
    weighted_block_average
from .thermo import (
    pressure_at_midpoint_log,
    pressure_interface,
    surface_pressure_from_delp,
)


def pressure_level_average(field, delp_fine, delp_coarse, area,
                           factor: int):
    """Coarsen a 3D field on constant-pressure surfaces
    (budgets.py Grid.pressure_level_average).

    field/delp_fine [tile, nz, yf, xf]; delp_coarse
    [tile, nz, yc, xc]; area [tile, yf, xf]; factor = yf // yc.
    """
    import jax.numpy as jnp

    pe_fine = pressure_interface(delp_fine, axis=-3)
    pe_coarse_up = block_upsample(
        pressure_interface(delp_coarse, axis=-3), factor
    )

    def cols(x):  # [tile, nz(+1), y, x] -> [nz(+1), tile, y, x]
        return jnp.moveaxis(jnp.asarray(x), 1, 0)

    regridded = jnp.moveaxis(
        ppm_remap(
            cols(field), cols(pe_fine), cols(pe_coarse_up),
            iv=1, kord=9, exact_boundaries=True,
        ),
        0, 1,
    )
    return weighted_block_average(regridded, area[:, None], factor)


def second_moments(
    fields: Mapping[str, np.ndarray],
    pairs: Sequence[Tuple[str, str]],
) -> Dict[str, np.ndarray]:
    """Products computed at FINE resolution (budgets.py
    compute_second_moments) — coarsening these alongside the first
    moments is what makes the eddy decomposition possible."""
    return {
        f"{a}_{b}": fields[a] * fields[b] for a, b in pairs
    }


def eddy_flux(mean_product, mean_a, mean_b):
    """bar(ab) - bar(a) bar(b): the subgrid (eddy) part of a flux
    after coarse-graining."""
    return mean_product - mean_a * mean_b


def storage(begin, end, time_step: float):
    """(end - begin)/dt (budgets.py storage)."""
    return (end - begin) / time_step


def exposed_area(delp_fine, delp_coarse, area, factor: int):
    """Area where the fine-resolution surface pressure exceeds the
    upsampled coarse pressure midpoint (budgets.py
    area_above_fine_surface)."""
    import jax.numpy as jnp

    p_c = pressure_at_midpoint_log(delp_coarse, axis=-3)
    p_c_up = block_upsample(p_c, factor)
    ps = surface_pressure_from_delp(delp_fine, axis=-3)
    masked = jnp.where(
        p_c_up <= ps[:, None], jnp.asarray(area)[:, None], 0.0
    )
    return block_coarsen(masked, factor, "sum")


def compute_budget_ingredients(
    fine: Mapping[str, np.ndarray],
    delp_coarse,
    area,
    factor: int,
    flux_pairs: Sequence[Tuple[str, str]] = (
        ("omega", "air_temperature"),
        ("omega", "specific_humidity"),
    ),
) -> Dict[str, np.ndarray]:
    """The full recipe: coarsen first moments and second moments on
    pressure surfaces, return both plus the eddy decompositions
    (`eddy_<a>_<b>`) and the exposed area.

    fine must contain 'pressure_thickness_of_atmospheric_layer' plus
    every name referenced by flux_pairs.
    """
    delp_fine = fine["pressure_thickness_of_atmospheric_layer"]
    moments = second_moments(fine, flux_pairs)
    out: Dict[str, np.ndarray] = {}
    names_3d = {
        k
        for k in list(fine) + list(moments)
        if k != "pressure_thickness_of_atmospheric_layer"
    }
    merged = {**fine, **moments}
    for name in sorted(names_3d):
        out[name] = pressure_level_average(
            merged[name], delp_fine, delp_coarse, area, factor
        )
    for a, b in flux_pairs:
        out[f"eddy_{a}_{b}"] = eddy_flux(
            out[f"{a}_{b}"], out[a], out[b]
        )
    out["exposed_area"] = exposed_area(
        delp_fine, delp_coarse, area, factor
    )
    return out
