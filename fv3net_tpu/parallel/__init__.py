from .mesh import CubedSphereMesh, make_mesh, shard_state, global_mean

__all__ = ["CubedSphereMesh", "make_mesh", "shard_state", "global_mean"]
