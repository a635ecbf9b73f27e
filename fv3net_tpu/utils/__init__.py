from . import thermo
from .zenith import cos_zenith_angle
from .coarsen import (
    block_coarsen,
    block_edge_sum,
    block_median,
    block_upsample,
    weighted_block_average,
    xarray_block_reduce,
)
from .interpolate import (
    interpolate_1d,
    interpolate_to_pressure_levels,
    PRESSURE_GRID,
)

__all__ = [
    "thermo",
    "cos_zenith_angle",
    "block_coarsen",
    "block_edge_sum",
    "block_median",
    "block_upsample",
    "weighted_block_average",
    "xarray_block_reduce",
    "interpolate_1d",
    "interpolate_to_pressure_levels",
    "PRESSURE_GRID",
]
