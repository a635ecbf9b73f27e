from .simple import held_suarez_tendencies, saturation_adjustment
from .gfs import GFSPhysicsConfig, gfs_physics_step

__all__ = [
    "held_suarez_tendencies",
    "saturation_adjustment",
    "GFSPhysicsConfig",
    "gfs_physics_step",
]
