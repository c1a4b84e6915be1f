from .geopandas import GeoLayers, from_geopandas, from_wkt  # noqa: F401
