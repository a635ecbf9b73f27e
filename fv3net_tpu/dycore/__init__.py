from .sw import ShallowWaterState, shallow_water_step, make_sw_stepper

__all__ = ["ShallowWaterState", "shallow_water_step", "make_sw_stepper"]
