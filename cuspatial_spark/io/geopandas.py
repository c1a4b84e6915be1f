"""GeoPandas/shapely ingestion (SURVEY §2.8 #38-39).

Mirrors the reference's GeoPandasReader
(/root/reference/python/cuspatial/cuspatial/io/geopandas_reader.py:27-140):
iterate geometry objects on the driver, bucket by type into the four
flat coordinate/offset layers, and record per-row (feature_type,
union_offset) — the GeoMeta (geometa.py:15-59).

shapely is optional: geometries are consumed through their public
attribute protocol (``geom_type`` / ``.x`` / ``.coords`` / ``.geoms``
/ ``.exterior`` / ``.interiors``), so real shapely objects work when
the library is installed, and the bundled WKT parser (``from_wkt``)
produces protocol-compatible objects so the full path is exercised
without it.  Layers are driver-side NumPy (the broadcastable side of
every join); ``GeoLayers.points_df`` lifts the points layer into a
Spark DataFrame for the distributed side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..geometry import LinestringArrays, MultipointArrays, PolygonArrays

# feature_type codes — reference Feature_Enum (geometa.py)
NONE, POINT, MULTIPOINT, LINESTRING, POLYGON = -1, 0, 1, 2, 3


@dataclass
class _Geom:
    """Minimal shapely-protocol geometry used by the WKT parser."""

    geom_type: str
    coords: list = None
    geoms: list = None
    exterior: object = None
    interiors: list = None

    @property
    def x(self):
        return self.coords[0][0]

    @property
    def y(self):
        return self.coords[0][1]


def _parse_ring(body: str):
    return [tuple(float(v) for v in pt.split()) for pt in body.split(",")]


def from_wkt(wkts):
    """Parse POINT / MULTIPOINT / LINESTRING / POLYGON WKT strings into
    protocol-compatible geometry objects (None/'' -> missing row)."""
    out = []
    for w in wkts:
        if w is None or not str(w).strip():
            out.append(None)
            continue
        w = str(w).strip()
        kind = re.match(r"(\w+)", w).group(1).upper()
        body = w[w.index("(") + 1 : w.rindex(")")]
        if kind == "POINT":
            out.append(_Geom("Point", coords=_parse_ring(body)))
        elif kind == "MULTIPOINT":
            pts = [p.strip().strip("()") for p in body.split(",")]
            coords = [tuple(float(v) for v in p.split()) for p in pts]
            out.append(
                _Geom(
                    "MultiPoint",
                    geoms=[_Geom("Point", coords=[c]) for c in coords],
                )
            )
        elif kind == "LINESTRING":
            out.append(_Geom("LineString", coords=_parse_ring(body)))
        elif kind == "POLYGON":
            rings = re.findall(r"\(([^()]*)\)", body)
            ext = _Geom("LinearRing", coords=_parse_ring(rings[0]))
            ints = [_Geom("LinearRing", coords=_parse_ring(r)) for r in rings[1:]]
            out.append(_Geom("Polygon", exterior=ext, interiors=ints))
        else:
            raise ValueError(f"unsupported WKT type: {kind}")
    return out


@dataclass
class GeoLayers:
    """The four typed layers + GeoMeta-style row map.

    feature_types[i] / union_offsets[i]: per input row, which layer it
    landed in and its index there (geocolumn.py:30-66 union shape).
    """

    feature_types: np.ndarray
    union_offsets: np.ndarray
    point_x: np.ndarray
    point_y: np.ndarray
    multipoints: MultipointArrays
    linestrings: LinestringArrays
    polygons: PolygonArrays

    def points_df(self, spark, ids=None):
        """Points layer as a Spark DataFrame (row_id, x, y) — the
        distributed side of a spatial join."""
        import pandas as pd

        rid = np.flatnonzero(self.feature_types == POINT)
        if ids is not None:
            rid = np.asarray(ids)[rid]
        return spark.createDataFrame(
            pd.DataFrame({"row_id": rid, "x": self.point_x, "y": self.point_y})
        )

    def __len__(self):
        return len(self.feature_types)

    def sizes(self) -> np.ndarray:
        """Vertex count per input row (reference GeoSeries.sizes,
        geoseries.py ``sizes`` property); 0 for missing rows."""
        out = np.zeros(len(self), dtype=np.int64)
        mp_off = self.multipoints.part_offsets
        ls_off = self.linestrings.part_offsets
        pg_part = self.polygons.part_offsets
        pg_ring = self.polygons.ring_offsets
        for i, (ft, k) in enumerate(zip(self.feature_types, self.union_offsets)):
            if ft == POINT:
                out[i] = 1
            elif ft == MULTIPOINT:
                out[i] = mp_off[k + 1] - mp_off[k]
            elif ft == LINESTRING:
                out[i] = ls_off[k + 1] - ls_off[k]
            elif ft == POLYGON:
                out[i] = pg_ring[pg_part[k + 1]] - pg_ring[pg_part[k]]
        return out

    def iloc(self, indices) -> "GeoLayers":
        """Positional row selection (reference GeoSeries.iloc) — the
        selected rows become a fresh, compact GeoLayers."""
        geoms = to_geoms(self)
        return from_geopandas([geoms[int(i)] for i in np.asarray(indices)])


def align(ids_a, ids_b):
    """Index alignment of two geometry collections (reference
    GeoSeries.align semantics): returns (index, pos_a, pos_b) where
    ``index`` is the sorted union of both id sets and pos_* are the
    positional indices into each input (-1 where the id is absent).
    Feed pos_* to ``GeoLayers.iloc`` (mapping -1 to a missing row) or
    use them as the join keys of a DataFrame-native align."""
    ids_a = np.asarray(ids_a)
    ids_b = np.asarray(ids_b)
    union = np.union1d(ids_a, ids_b)
    pos_a = np.full(len(union), -1, dtype=np.int64)
    pos_b = np.full(len(union), -1, dtype=np.int64)
    pos_a[np.searchsorted(union, ids_a)] = np.arange(len(ids_a))
    pos_b[np.searchsorted(union, ids_b)] = np.arange(len(ids_b))
    return union, pos_a, pos_b


# ------------------------------------------------------------------ export


def _fmt(v: float) -> str:
    """Shortest round-trip decimal (repr of a Python float)."""
    return repr(float(v))


def _fmt_ring(xs, ys) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in zip(xs, ys))


def to_geoms(layers: GeoLayers):
    """Inverse of ``from_geopandas``: per-row shapely-protocol geometry
    objects rebuilt from the four flat layers (None for missing rows).
    Multi-part polygons were flattened on ingestion (each part's rings
    merged under one layer entry, reference bounding.py flatten), so
    they export as a single Polygon whose extra rings are interiors."""
    mp_off = layers.multipoints.part_offsets
    mp_x, mp_y = layers.multipoints.x, layers.multipoints.y
    ls_off = layers.linestrings.part_offsets
    ls_x, ls_y = layers.linestrings.x, layers.linestrings.y
    pg_part = layers.polygons.part_offsets
    pg_ring = layers.polygons.ring_offsets
    pg_x, pg_y = layers.polygons.x, layers.polygons.y

    out = []
    for ft, k in zip(layers.feature_types, layers.union_offsets):
        if ft == POINT:
            out.append(_Geom("Point", coords=[(layers.point_x[k], layers.point_y[k])]))
        elif ft == MULTIPOINT:
            s, e = mp_off[k], mp_off[k + 1]
            out.append(
                _Geom(
                    "MultiPoint",
                    geoms=[
                        _Geom("Point", coords=[(mp_x[i], mp_y[i])]) for i in range(s, e)
                    ],
                )
            )
        elif ft == LINESTRING:
            s, e = ls_off[k], ls_off[k + 1]
            out.append(
                _Geom("LineString", coords=list(zip(ls_x[s:e], ls_y[s:e])))
            )
        elif ft == POLYGON:
            rings = []
            for r in range(pg_part[k], pg_part[k + 1]):
                s, e = pg_ring[r], pg_ring[r + 1]
                rings.append(_Geom("LinearRing", coords=list(zip(pg_x[s:e], pg_y[s:e]))))
            out.append(_Geom("Polygon", exterior=rings[0], interiors=rings[1:]))
        else:
            out.append(None)
    return out


def to_wkt(layers: GeoLayers) -> list:
    """Per-row WKT strings (None for missing rows) — the
    engine-portable serialization of ``to_geoms``."""
    out = []
    for g in to_geoms(layers):
        if g is None:
            out.append(None)
        elif g.geom_type == "Point":
            out.append(f"POINT ({_fmt(g.x)} {_fmt(g.y)})")
        elif g.geom_type == "MultiPoint":
            body = ", ".join(f"({_fmt(p.x)} {_fmt(p.y)})" for p in g.geoms)
            out.append(f"MULTIPOINT ({body})")
        elif g.geom_type == "LineString":
            xs, ys = zip(*g.coords)
            out.append(f"LINESTRING ({_fmt_ring(xs, ys)})")
        else:  # Polygon
            rings = [g.exterior] + list(g.interiors or [])
            body = ", ".join(
                "(" + _fmt_ring(*zip(*r.coords)) + ")" for r in rings
            )
            out.append(f"POLYGON ({body})")
    return out


def to_geopandas(layers: GeoLayers):
    """Rebuild a geopandas.GeoSeries (reference GeoSeries.to_geopandas,
    geoseries.py:452-630).  Requires shapely/geopandas; raises
    ImportError in environments without them — ``to_wkt``/``to_geoms``
    are the dependency-free exports."""
    import geopandas as gpd  # noqa: F401  (optional dependency)
    from shapely import wkt as _shapely_wkt

    return gpd.GeoSeries(
        [None if w is None else _shapely_wkt.loads(w) for w in to_wkt(layers)]
    )


def from_geopandas(geoms) -> GeoLayers:
    """Bucket an iterable of shapely(-protocol) geometries — e.g.
    ``gdf.geometry`` of a GeoDataFrame — into the 4 flat layers
    (GeoPandasReader semantics: each multipolygon part keeps its own
    rings; multilinestrings flatten to their parts)."""
    # accept a GeoDataFrame / GeoSeries without importing geopandas
    if hasattr(geoms, "geometry") and not hasattr(geoms, "geom_type"):
        geoms = geoms.geometry
    ftypes, uoff = [], []
    px, py = [], []
    mp_off, mp_x, mp_y = [0], [], []
    ls_off, ls_x, ls_y = [0], [], []
    pg_part, pg_ring, pg_x, pg_y = [0], [0], [], []

    def _add_ring(ring):
        cs = list(ring.coords)
        pg_x.extend(c[0] for c in cs)
        pg_y.extend(c[1] for c in cs)
        pg_ring.append(len(pg_x))

    for g in geoms:
        if g is None or (hasattr(g, "is_empty") and g.is_empty):
            ftypes.append(NONE)
            uoff.append(-1)
            continue
        kind = g.geom_type
        if kind == "Point":
            ftypes.append(POINT)
            uoff.append(len(px))
            px.append(g.x)
            py.append(g.y)
        elif kind == "MultiPoint":
            ftypes.append(MULTIPOINT)
            uoff.append(len(mp_off) - 1)
            for p in g.geoms:
                mp_x.append(p.x)
                mp_y.append(p.y)
            mp_off.append(len(mp_x))
        elif kind == "LineString":
            ftypes.append(LINESTRING)
            uoff.append(len(ls_off) - 1)
            cs = list(g.coords)
            ls_x.extend(c[0] for c in cs)
            ls_y.extend(c[1] for c in cs)
            ls_off.append(len(ls_x))
        elif kind == "MultiLineString":
            # reference flattens parts (geopandas_reader.py MultiLineString)
            ftypes.append(LINESTRING)
            uoff.append(len(ls_off) - 1)
            for part in g.geoms:
                cs = list(part.coords)
                ls_x.extend(c[0] for c in cs)
                ls_y.extend(c[1] for c in cs)
            ls_off.append(len(ls_x))
        elif kind == "Polygon":
            ftypes.append(POLYGON)
            uoff.append(len(pg_part) - 1)
            _add_ring(g.exterior)
            for hole in g.interiors or []:
                _add_ring(hole)
            pg_part.append(len(pg_ring) - 1)
        elif kind == "MultiPolygon":
            # one layer entry per part, like polygon_bounding_boxes'
            # flattened multipolygon handling (bounding.py:19-80)
            ftypes.append(POLYGON)
            uoff.append(len(pg_part) - 1)
            for part in g.geoms:
                _add_ring(part.exterior)
                for hole in part.interiors or []:
                    _add_ring(hole)
            pg_part.append(len(pg_ring) - 1)
        else:
            raise ValueError(f"unsupported geometry type: {kind}")

    return GeoLayers(
        feature_types=np.asarray(ftypes, dtype=np.int8),
        union_offsets=np.asarray(uoff, dtype=np.int64),
        point_x=np.asarray(px, dtype=np.float64),
        point_y=np.asarray(py, dtype=np.float64),
        multipoints=MultipointArrays(mp_off, mp_x, mp_y),
        linestrings=LinestringArrays(ls_off, ls_x, ls_y),
        polygons=PolygonArrays(pg_part, pg_ring, pg_x, pg_y),
    )
