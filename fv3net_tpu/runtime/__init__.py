from .loop import TimeLoop, Stepper, Monitor, add_tendency
from .derived_state import DerivedModelState
from .config import UserConfig, get_config
from . import names

__all__ = [
    "TimeLoop",
    "Stepper",
    "Monitor",
    "add_tendency",
    "DerivedModelState",
    "UserConfig",
    "get_config",
    "names",
]
