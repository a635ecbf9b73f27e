from .topology import (
    EDGE_W,
    EDGE_E,
    EDGE_S,
    EDGE_N,
    FACE_FRAMES,
    EdgeLink,
    edge_links,
    halo_source_indices,
)
from .geometry import CubedSphereGrid, gnomonic_grid, lonlat_from_xyz
from .halo import halo_exchange, halo_exchange_vector_cgrid, halo_exchange_dgrid

__all__ = [
    "EDGE_W",
    "EDGE_E",
    "EDGE_S",
    "EDGE_N",
    "FACE_FRAMES",
    "EdgeLink",
    "edge_links",
    "halo_source_indices",
    "CubedSphereGrid",
    "gnomonic_grid",
    "lonlat_from_xyz",
    "halo_exchange",
    "halo_exchange_vector_cgrid",
    "halo_exchange_dgrid",
]
