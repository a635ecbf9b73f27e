"""Coordinate-addressed zarr writer (the vcm.ZarrMapping role,
external/vcm/vcm/_zarr_mapping.py: pre-allocate a store keyed by
coordinate values — e.g. (time, tile) — and let independent writers
fill their slot; used to assemble datasets from parallel workers).

Built on the framework's zarr-lite store so output is real zarr v2."""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

from .zarr_lite import ZarrLiteStore


class ZarrMapping:
    """Assign ds[key_coords] = fields, where the leading dims of every
    array are addressed by coordinate values (vcm ZarrMapping.__setitem__
    semantics)."""

    def __init__(
        self,
        store: ZarrLiteStore,
        schema: Mapping[str, tuple],  # name -> (dims, shape, dtype)
        coords: Mapping[str, Sequence],  # leading-dim coordinates
        dims: Sequence[str],  # leading (addressing) dims, in order
    ):
        self.store = store
        self.dims = list(dims)
        self.coords = {k: list(v) for k, v in coords.items()}
        self._index = {
            d: {v: i for i, v in enumerate(self.coords[d])}
            for d in self.dims
        }
        self.schema = dict(schema)
        lead_shape = tuple(len(self.coords[d]) for d in self.dims)
        for name, (vdims, vshape, dtype) in self.schema.items():
            full_shape = lead_shape + tuple(vshape)
            # one chunk per leading-coord slot: parallel writers never
            # touch the same chunk file
            chunks = (1,) * len(lead_shape) + tuple(vshape)
            store.create_array(
                name, full_shape, chunks, np.dtype(dtype),
                dims=tuple(self.dims) + tuple(vdims),
            )

    @staticmethod
    def from_schema(path: str, schema, coords, dims) -> "ZarrMapping":
        return ZarrMapping(
            ZarrLiteStore(path), schema, coords, dims
        )

    def __setitem__(self, keys, fields: Mapping[str, np.ndarray]):
        if not isinstance(keys, tuple):
            keys = (keys,)
        idx = tuple(
            self._index[d][k] for d, k in zip(self.dims, keys)
        )
        for name, data in fields.items():
            self.store.write_chunk(
                name, idx + (0,) * np.ndim(data),
                np.asarray(data)[(None,) * len(idx)],
            )

    def read(self, name: str) -> np.ndarray:
        return self.store.read(name)
