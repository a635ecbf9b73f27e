"""Data catalog: named entries resolving to datasets on demand.

The role of `vcm.catalog` (external/vcm/vcm/catalog.py:1-7 + the
51-entry catalog.yaml): the reference's diagnostics and loaders
resolve grids and verification data by catalog key
(`catalog["grid/c48"].to_dask()`).  This environment has no GCS and no
intake, so the catalog is a small registry with two entry kinds:

- ``grid/c{N}`` and ``landseamask/c{N}``: constructed on demand from
  the cubed-sphere geometry (the reference stores these as zarrs; here
  the generator IS the data)
- user-registered paths: zarr-lite stores or restart directories
  registered at runtime or from a YAML file
  (``{name: {kind: zarr|restarts, path: ...}}``)

Entries expose ``.read()`` -> dict of numpy arrays (grid entries:
area/lat/lon/land_sea_mask), mirroring ``to_dask()``'s role as the
terminal call.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, Mapping

import numpy as np


class CatalogEntry:
    def __init__(self, name: str, loader: Callable[[], Mapping],
                 description: str = ""):
        self.name = name
        self.description = description
        self._loader = loader

    def read(self) -> Mapping[str, np.ndarray]:
        return self._loader()

    # reference-API alias (catalog entries are consumed via to_dask)
    to_dask = read

    def __repr__(self):
        return f"<CatalogEntry {self.name}: {self.description}>"


_GRID_RE = re.compile(r"^grid/c(\d+)$")
_MASK_RE = re.compile(r"^landseamask/c(\d+)$")


def _grid_fields(n: int) -> Dict[str, np.ndarray]:
    from ..grid import CubedSphereGrid

    g = CubedSphereGrid.make(n, halo=3)
    sl = g.interior
    return {
        "area": np.asarray(g.area[sl]),
        "lat": np.asarray(g.lat[sl]),
        "lon": np.asarray(g.lon[sl]),
        "latb": _corner_latlon(g, n)[0],
        "lonb": _corner_latlon(g, n)[1],
    }


def _corner_latlon(g, n: int):
    from ..grid.geometry import lonlat_from_xyz

    h = g.halo
    cor = np.asarray(
        g.corners_xyz[:, h : h + n + 1, h : h + n + 1]
    )
    lon, lat = lonlat_from_xyz(cor)
    return np.asarray(lat), np.asarray(lon)


def _land_sea_mask(n: int) -> Dict[str, np.ndarray]:
    """A deterministic synthetic land mask (no surface datasets ship in
    this environment): land where a low-order spherical-harmonic-like
    pattern is positive, ~30% land fraction."""
    g = _grid_fields(n)
    lat, lon = g["lat"], g["lon"]
    pat = (
        np.sin(2 * lat) * np.cos(lon)
        + 0.5 * np.cos(3 * lon + 1.0) * np.cos(lat)
        - 0.35
    )
    return {"land_sea_mask": (pat > 0).astype(np.float64)}


class Catalog:
    """Key -> CatalogEntry mapping with on-demand generated grid
    entries and user-registered stores."""

    def __init__(self):
        self._entries: Dict[str, CatalogEntry] = {}

    def register(self, name: str, loader: Callable[[], Mapping],
                 description: str = ""):
        self._entries[name] = CatalogEntry(name, loader, description)

    def register_zarr(self, name: str, path: str, description: str = ""):
        def load():
            from ..io.zarr_lite import ZarrLiteStore

            store = ZarrLiteStore(path)
            return {v: store.read(v) for v in store.arrays()}

        self.register(name, load, description or f"zarr at {path}")

    def register_restarts(self, name: str, path: str,
                          description: str = ""):
        def load():
            from ..io.restarts import open_restarts

            opened = open_restarts(path)
            merged = {}
            for pfx in sorted(opened):
                merged.update(
                    {k: q.values for k, q in opened[pfx].items()}
                )
            return merged

        self.register(name, load, description or f"restarts at {path}")

    def load_yaml(self, path: str):
        """{name: {kind: zarr|restarts, path, description?}}"""
        import yaml

        with open(path) as f:
            spec = yaml.safe_load(f) or {}
        for name, ent in spec.items():
            kind = ent.get("kind", "zarr")
            if kind == "zarr":
                self.register_zarr(name, ent["path"],
                                   ent.get("description", ""))
            elif kind == "restarts":
                self.register_restarts(name, ent["path"],
                                       ent.get("description", ""))
            else:
                raise ValueError(f"unknown catalog kind {kind!r}")

    def __getitem__(self, key: str) -> CatalogEntry:
        if key in self._entries:
            return self._entries[key]
        m = _GRID_RE.match(key)
        if m:
            n = int(m.group(1))
            return CatalogEntry(
                key, lambda n=n: _grid_fields(n),
                f"C{n} cubed-sphere grid (generated)",
            )
        m = _MASK_RE.match(key)
        if m:
            n = int(m.group(1))
            return CatalogEntry(
                key, lambda n=n: _land_sea_mask(n),
                f"C{n} synthetic land-sea mask",
            )
        raise KeyError(key)

    def __contains__(self, key: str) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def keys(self):
        gen = [f"grid/c{n}" for n in (12, 24, 48, 96, 192, 384)]
        gen += [f"landseamask/c{n}" for n in (12, 24, 48, 96, 192, 384)]
        return sorted(set(self._entries) | set(gen))


# the module-level singleton, like `vcm.catalog.catalog`
catalog = Catalog()
