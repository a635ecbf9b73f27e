from .batches import (
    batches_from_zarr,
    open_batches_from_config,
    batches_functions,
    SyntheticWaves,
    SyntheticNoise,
)
from .sequences import Map, Local, shuffle, to_local

__all__ = [
    "batches_from_zarr",
    "open_batches_from_config",
    "batches_functions",
    "SyntheticWaves",
    "SyntheticNoise",
    "Map",
    "Local",
    "shuffle",
    "to_local",
]
