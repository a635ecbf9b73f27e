"""Cross-layout assembly of cubed-sphere tiles
(external/vcm/vcm/cubedsphere/cross.py to_cross).

Combines the six tiles into one 2D "cross" image — each tile rotated
into a common orientation and placed on a 3x4 board — for quick maps
and 2D image processing (Weyn & Durran 2019 layout).  The tile
positions and source orientations follow the reference TOPOLOGY
(cross.py:24-31); input is [..., tile, y, x] numpy, output
[..., 3*n, 4*n] with NaN in the empty board cells.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

SW, NW, NE, SE = 3, 0, 1, 2


@dataclasses.dataclass
class _Tile:
    x: int
    y: int
    origin: int


TOPOLOGY: Dict[int, _Tile] = {
    0: _Tile(0, 1, SW),
    1: _Tile(1, 1, SW),
    2: _Tile(1, 2, SW),
    3: _Tile(2, 1, NW),
    4: _Tile(3, 1, NW),
    5: _Tile(1, 0, SE),
}


def _rotate(data: np.ndarray, origin: int, dest_origin: int):
    """(cross.py:34) rotate so tile corners line up on the board."""
    return np.rot90(data, origin - dest_origin, axes=(-2, -1))


def to_cross(data: np.ndarray, tile_axis: int = -3) -> np.ndarray:
    """[..., tile, y, x] -> [..., 3n, 4n] cross image (cross.py:62)."""
    data = np.moveaxis(np.asarray(data), tile_axis, -3)
    if data.shape[-3] != 6:
        raise ValueError(f"need 6 tiles, got {data.shape[-3]}")
    n = data.shape[-1]
    if data.shape[-2] != n:
        raise ValueError("tiles must be square")
    board = np.full(data.shape[:-3] + (3 * n, 4 * n), np.nan,
                    dtype=data.dtype if np.issubdtype(
                        data.dtype, np.floating) else np.float64)
    for tile_num, spec in TOPOLOGY.items():
        block = _rotate(data[..., tile_num, :, :], spec.origin, SW)
        y0, x0 = spec.y * n, spec.x * n
        board[..., y0 : y0 + n, x0 : x0 + n] = block
    return board


def positions() -> Dict[int, Tuple[int, int]]:
    """Board (row, col) of each tile, for annotating plots."""
    return {k: (v.y, v.x) for k, v in TOPOLOGY.items()}
