from .tile_join import (  # noqa: F401
    assign_tiles,
    point_in_polygon_join,
    point_to_nearest_linestring_join,
    tiles_covering_bboxes,
)
