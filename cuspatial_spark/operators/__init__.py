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
)
