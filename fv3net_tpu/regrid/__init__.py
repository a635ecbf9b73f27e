from .latlon import FregridLatLon

__all__ = ["FregridLatLon"]
