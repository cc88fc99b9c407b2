from .io import (write_areas_list, read_areas_list, write_tiles_kml,
                 write_tiles_geojson, srtm_cell_name)

__all__ = ["write_areas_list", "read_areas_list", "write_tiles_kml",
           "write_tiles_geojson", "srtm_cell_name"]
