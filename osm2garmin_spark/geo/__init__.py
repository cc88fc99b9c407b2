from .units import (
    MAP_UNITS_FULL_CIRCLE,
    to_map_unit,
    to_degrees,
    round_down,
    round_up,
    round_nearest,
)
from .area import Area, round_area

__all__ = [
    "MAP_UNITS_FULL_CIRCLE",
    "to_map_unit",
    "to_degrees",
    "round_down",
    "round_up",
    "round_nearest",
    "Area",
    "round_area",
]
