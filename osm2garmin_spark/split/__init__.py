from .quadtree import DensityGrid, SplittableDensityArea, split_area
from .density import collect_density, density_cells

__all__ = [
    "DensityGrid",
    "SplittableDensityArea",
    "split_area",
    "collect_density",
    "density_cells",
]
