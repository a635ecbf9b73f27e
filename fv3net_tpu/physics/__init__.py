from .simple import held_suarez_tendencies, saturation_adjustment

__all__ = ["held_suarez_tendencies", "saturation_adjustment"]
