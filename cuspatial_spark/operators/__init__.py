from .bounding import (  # noqa: F401
    linestring_bounding_boxes,
    polygon_bounding_boxes,
    trajectory_bounding_boxes,
)
from .distance import (  # noqa: F401
    directed_hausdorff_distance,
    haversine_distance,
    pairwise_point_distance,
    pairwise_point_linestring_distance,
)
from .filtering import points_in_spatial_window  # noqa: F401
from .indexing import quadtree_on_points  # noqa: F401
from .join import (  # noqa: F401
    join_quadtree_and_bounding_boxes,
    point_in_polygon,
    quadtree_point_in_polygon,
    quadtree_point_to_nearest_linestring,
)
from .projection import sinusoidal_projection  # noqa: F401
from .trajectory import (  # noqa: F401
    derive_trajectories,
    trajectory_distances_and_speeds,
    trajectory_summary,
)
from . import binpreds, pairwise  # noqa: F401
from .asof import asof_join  # noqa: F401
from .interval import interval_join  # noqa: F401
from .dispatch import distance  # noqa: F401
from .indexing import quadtree_on_points_global  # noqa: F401
from .intersection import (  # noqa: F401
    linestring_overlaps_linestring,
    linestring_touches_linestring,
    pairwise_linestring_intersection,
)
from .pairwise import (  # noqa: F401
    pairwise_linestring_distance,
    pairwise_linestring_polygon_distance,
    pairwise_multipoint_equals_count,
    pairwise_point_in_polygon,
    pairwise_point_linestring_nearest_points,
    pairwise_point_polygon_distance,
    pairwise_polygon_distance,
)
