from .zarr_lite import ZarrLiteStore, open_zarr_lite

__all__ = ["ZarrLiteStore", "open_zarr_lite"]
