from .remap import (
    cs_profile,
    ppm_profile,
    ppm_remap,
    interpolate_columns,
)

__all__ = ["cs_profile", "ppm_profile", "ppm_remap", "interpolate_columns"]
