from .webpages import geotag_points, synth_webpages  # noqa: F401
