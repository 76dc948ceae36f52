from . import boxes, geometry

__all__ = ["boxes", "geometry"]
