"""Geometry layer model.

Mirrors the reference's GeoArrow-flat buffers (offsets + interleaved or
deinterleaved coords) rather than its Arrow dense union: one container
per geometry type, matching the buffers every cuSpatial kernel actually
consumes (/root/reference/python/cuspatial/cuspatial/core/spatial/join.py:76-87,
geoseries.py:670-825 `from_points_xy` / `from_polygons_xy` /
`from_linestrings_xy`).

Two forms:

- driver-side ``*Arrays`` dataclasses (NumPy buffers) for geometry
  layers that are small enough to broadcast (polygon/linestring layers
  in a spatial join — the common case at web scale);
- Spark DataFrames with one feature per row for the big side (points),
  any payload columns riding along.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _as_f(a) -> np.ndarray:
    a = np.asarray(a)
    if a.dtype not in (np.float32, np.float64):
        a = a.astype(np.float64)
    return a


def require_single_part(layer, op_name: str):
    """Quadtree join kernels accept only single-part geometries — the
    same validation error as the reference (core/spatial/join.py:71-74
    'GeoSeries cannot contain multipolygons', join.py:317-320 for
    multilinestrings; quadtree_point_in_polygon.cuh:118-119)."""
    if isinstance(layer, (MultiLinestringArrays, MultiPolygonArrays)):
        raise ValueError(
            f"{op_name} does not support multi-part geometries; "
            "flatten to single parts first (reference restriction, "
            "core/spatial/join.py:71-74,317-320)"
        )


@dataclass
class PolygonArrays:
    """Flat polygon layer: polygon i spans rings
    ring_offsets[part_offsets[i]] .. ring_offsets[part_offsets[i+1]],
    ring r spans vertices ring_offsets[r] .. ring_offsets[r+1]-1."""

    part_offsets: np.ndarray  # len n_polys+1 -> ring space
    ring_offsets: np.ndarray  # len n_rings+1 -> vertex space
    x: np.ndarray
    y: np.ndarray
    ids: np.ndarray = field(default=None)  # optional user polygon ids

    def __post_init__(self):
        self.part_offsets = np.asarray(self.part_offsets, dtype=np.int64)
        self.ring_offsets = np.asarray(self.ring_offsets, dtype=np.int64)
        self.x = _as_f(self.x)
        self.y = _as_f(self.y)
        if self.ids is None:
            self.ids = np.arange(len(self), dtype=np.int64)
        else:
            self.ids = np.asarray(self.ids, dtype=np.int64)

    @classmethod
    def from_polygons_xy(cls, xy, ring_offsets, part_offsets, ids=None):
        """Same argument shape as GeoSeries.from_polygons_xy
        (geoseries.py:776): interleaved xy + ring/part offsets."""
        xy = _as_f(xy)
        return cls(part_offsets, ring_offsets, xy[::2].copy(), xy[1::2].copy(), ids)

    def __len__(self):
        return len(self.part_offsets) - 1

    def vertex_ranges(self):
        """Per-polygon (start, end) into the vertex arrays."""
        return self.ring_offsets[self.part_offsets[:-1]], self.ring_offsets[self.part_offsets[1:]]

    def bounding_boxes(self, expansion_radius: float = 0.0):
        """(minx, miny, maxx, maxy) arrays, one row per polygon
        (reference core/spatial/bounding.py:19-80)."""
        s, e = self.vertex_ranges()
        n = len(self)
        minx = np.empty(n)
        miny = np.empty(n)
        maxx = np.empty(n)
        maxy = np.empty(n)
        for i in range(n):  # driver-side over broadcastable layer; n is small
            minx[i] = self.x[s[i]:e[i]].min()
            maxx[i] = self.x[s[i]:e[i]].max()
            miny[i] = self.y[s[i]:e[i]].min()
            maxy[i] = self.y[s[i]:e[i]].max()
        r = expansion_radius
        return minx - r, miny - r, maxx + r, maxy + r


@dataclass
class MultipointArrays:
    """Flat multipoint layer: multipoint i spans points
    part_offsets[i] .. part_offsets[i+1]-1 (reference
    GeoSeries.from_multipoints_xy, geoseries.py:700-740)."""

    part_offsets: np.ndarray
    x: np.ndarray
    y: np.ndarray
    ids: np.ndarray = field(default=None)

    def __post_init__(self):
        self.part_offsets = np.asarray(self.part_offsets, dtype=np.int64)
        self.x = _as_f(self.x)
        self.y = _as_f(self.y)
        if self.ids is None:
            self.ids = np.arange(len(self), dtype=np.int64)
        else:
            self.ids = np.asarray(self.ids, dtype=np.int64)

    @classmethod
    def from_multipoints_xy(cls, xy, part_offsets, ids=None):
        """Same argument shape as GeoSeries.from_multipoints_xy:
        interleaved xy + geometry offsets."""
        xy = _as_f(xy)
        return cls(part_offsets, xy[::2].copy(), xy[1::2].copy(), ids)

    def __len__(self):
        return len(self.part_offsets) - 1

    def bounding_boxes(self, expansion_radius: float = 0.0):
        o = self.part_offsets
        n = len(self)
        minx = np.empty(n)
        miny = np.empty(n)
        maxx = np.empty(n)
        maxy = np.empty(n)
        for i in range(n):
            minx[i] = self.x[o[i]:o[i + 1]].min()
            maxx[i] = self.x[o[i]:o[i + 1]].max()
            miny[i] = self.y[o[i]:o[i + 1]].min()
            maxy[i] = self.y[o[i]:o[i + 1]].max()
        r = expansion_radius
        return minx - r, miny - r, maxx + r, maxy + r


@dataclass
class MultiLinestringArrays:
    """Multi-part linestring layer: geometry i spans parts
    geometry_offsets[i] .. geometry_offsets[i+1]-1 of the underlying
    single-part layer (the reference's geometry_offset level,
    geoseries.py:729-746 from_linestrings_xy).  Parts of one geometry
    are contiguous, so a geometry's vertex range is contiguous too."""

    geometry_offsets: np.ndarray  # len n_geoms+1 -> part space
    parts: "LinestringArrays"
    ids: np.ndarray = field(default=None)

    def __post_init__(self):
        self.geometry_offsets = np.asarray(self.geometry_offsets, dtype=np.int64)
        if self.ids is None:
            self.ids = np.arange(len(self), dtype=np.int64)
        else:
            self.ids = np.asarray(self.ids, dtype=np.int64)

    @classmethod
    def from_linestrings_xy(cls, xy, part_offsets, geometry_offsets, ids=None):
        """Same argument shape as GeoSeries.from_linestrings_xy
        (geoseries.py:729-746): interleaved xy + part + geometry
        offsets."""
        return cls(geometry_offsets, LinestringArrays.from_linestrings_xy(xy, part_offsets), ids)

    def __len__(self):
        return len(self.geometry_offsets) - 1

    def part_table(self):
        """(geometry_index, part_index) flat arrays — the broadcast
        expansion table for part-level kernels."""
        counts = self.geometry_offsets[1:] - self.geometry_offsets[:-1]
        geom = np.repeat(np.arange(len(self), dtype=np.int64), counts)
        part = np.arange(self.geometry_offsets[-1], dtype=np.int64)
        return geom, part

    def vertex_ranges(self):
        po = self.parts.part_offsets
        return po[self.geometry_offsets[:-1]], po[self.geometry_offsets[1:]]

    def bounding_boxes(self, expansion_radius: float = 0.0):
        """One bbox per GEOMETRY, parts flattened (reference
        core/spatial/bounding.py:83-130 linestring_bounding_boxes
        accepts multilinestrings the same way)."""
        s, e = self.vertex_ranges()
        n = len(self)
        minx = np.empty(n)
        miny = np.empty(n)
        maxx = np.empty(n)
        maxy = np.empty(n)
        for i in range(n):
            minx[i] = self.parts.x[s[i]:e[i]].min()
            maxx[i] = self.parts.x[s[i]:e[i]].max()
            miny[i] = self.parts.y[s[i]:e[i]].min()
            maxy[i] = self.parts.y[s[i]:e[i]].max()
        r = expansion_radius
        return minx - r, miny - r, maxx + r, maxy + r


@dataclass
class MultiPolygonArrays:
    """Multi-part polygon layer: geometry i spans polygons
    geometry_offsets[i] .. geometry_offsets[i+1]-1 of the underlying
    single-part layer (reference geometry_offset level,
    geoseries.py:776-825 from_polygons_xy)."""

    geometry_offsets: np.ndarray  # len n_geoms+1 -> polygon space
    parts: "PolygonArrays"
    ids: np.ndarray = field(default=None)

    def __post_init__(self):
        self.geometry_offsets = np.asarray(self.geometry_offsets, dtype=np.int64)
        if self.ids is None:
            self.ids = np.arange(len(self), dtype=np.int64)
        else:
            self.ids = np.asarray(self.ids, dtype=np.int64)

    @classmethod
    def from_polygons_xy(cls, xy, ring_offsets, part_offsets, geometry_offsets, ids=None):
        return cls(
            geometry_offsets,
            PolygonArrays.from_polygons_xy(xy, ring_offsets, part_offsets),
            ids,
        )

    def __len__(self):
        return len(self.geometry_offsets) - 1

    def part_table(self):
        counts = self.geometry_offsets[1:] - self.geometry_offsets[:-1]
        geom = np.repeat(np.arange(len(self), dtype=np.int64), counts)
        part = np.arange(self.geometry_offsets[-1], dtype=np.int64)
        return geom, part

    def vertex_ranges(self):
        ro, po = self.parts.ring_offsets, self.parts.part_offsets
        return ro[po[self.geometry_offsets[:-1]]], ro[po[self.geometry_offsets[1:]]]

    def bounding_boxes(self, expansion_radius: float = 0.0):
        """One bbox per GEOMETRY, parts flattened (reference
        core/spatial/bounding.py:19-80 flattens multipolygon parts)."""
        s, e = self.vertex_ranges()
        n = len(self)
        minx = np.empty(n)
        miny = np.empty(n)
        maxx = np.empty(n)
        maxy = np.empty(n)
        for i in range(n):
            minx[i] = self.parts.x[s[i]:e[i]].min()
            maxx[i] = self.parts.x[s[i]:e[i]].max()
            miny[i] = self.parts.y[s[i]:e[i]].min()
            maxy[i] = self.parts.y[s[i]:e[i]].max()
        r = expansion_radius
        return minx - r, miny - r, maxx + r, maxy + r


@dataclass
class LinestringArrays:
    """Flat (single-part) linestring layer: linestring i spans vertices
    part_offsets[i] .. part_offsets[i+1]-1."""

    part_offsets: np.ndarray
    x: np.ndarray
    y: np.ndarray
    ids: np.ndarray = field(default=None)

    def __post_init__(self):
        self.part_offsets = np.asarray(self.part_offsets, dtype=np.int64)
        self.x = _as_f(self.x)
        self.y = _as_f(self.y)
        if self.ids is None:
            self.ids = np.arange(len(self), dtype=np.int64)
        else:
            self.ids = np.asarray(self.ids, dtype=np.int64)

    @classmethod
    def from_linestrings_xy(cls, xy, part_offsets, ids=None):
        xy = _as_f(xy)
        return cls(part_offsets, xy[::2].copy(), xy[1::2].copy(), ids)

    def __len__(self):
        return len(self.part_offsets) - 1

    def bounding_boxes(self, expansion_radius: float = 0.0):
        o = self.part_offsets
        n = len(self)
        minx = np.empty(n)
        miny = np.empty(n)
        maxx = np.empty(n)
        maxy = np.empty(n)
        for i in range(n):
            minx[i] = self.x[o[i]:o[i + 1]].min()
            maxx[i] = self.x[o[i]:o[i + 1]].max()
            miny[i] = self.y[o[i]:o[i + 1]].min()
            maxy[i] = self.y[o[i]:o[i + 1]].max()
        r = expansion_radius
        return minx - r, miny - r, maxx + r, maxy + r
