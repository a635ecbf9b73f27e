from .registry import Registry
from .compute import compute_diagnostics, DIAGNOSTICS_REGISTRY
from .report import create_html, HTMLReport

__all__ = [
    "Registry",
    "compute_diagnostics",
    "DIAGNOSTICS_REGISTRY",
    "create_html",
    "HTMLReport",
]
