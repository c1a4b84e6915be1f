from .expressions import (  # noqa: F401
    haversine_expr,
    morton_key_expr,
    s2_cell_expr,
    sinusoidal_x_expr,
    sinusoidal_y_expr,
    spatial_window_predicate,
    tile_expr,
    with_hilbert_key,
    with_s2_cell,
)
