from .map_state import MapState, MapCaps, empty_map

__all__ = ["MapState", "MapCaps", "empty_map"]
