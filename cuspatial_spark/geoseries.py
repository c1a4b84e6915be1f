"""GeoSeries facade — the user-facing switch surface.

A reference user works through ``cuspatial.GeoSeries`` (constructed
via from_geopandas / WKT) and calls pairwise methods: ``.distance``,
the ten binary predicates, ``.sizes``, ``.iloc`` (reference
core/geoseries.py).  This module offers the same call shapes over the
Spark engine: a GeoSeries wraps the driver-side GeoLayers (broadcast
geometry) plus a SparkSession, materializes the aligned pairwise
DataFrame lazily, and dispatches to operators/dispatch.py (distance)
and operators/binpred_dispatch.py (predicates).

Mixed-kind series (the reference's GeoColumn union,
core/_column/geocolumn.py:30-66 + geometa.py:15-59) are supported by
per-kind sub-dispatch: pairwise ops partition the rows by their
(lhs_kind, rhs_kind) pair, run each homogeneous group through the
single-kind dispatcher, and reassemble by the original row ids (the
row map).  Row i of the result corresponds to row i of both inputs,
like the reference's aligned pairwise semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .io.geopandas import (
    LINESTRING,
    MULTIPOINT,
    NONE,
    POINT,
    POLYGON,
    GeoLayers,
    from_geopandas,
    from_wkt,
    to_geoms,
    to_wkt,
)

_KIND_NAMES = {
    POINT: "point",
    MULTIPOINT: "multipoint",
    LINESTRING: "linestring",
    POLYGON: "polygon",
}

_PREDICATES = (
    "intersects",
    "disjoint",
    "within",
    "contains",
    "contains_properly",
    "covers",
    "crosses",
    "touches",
    "overlaps",
    "geom_equals",
)


class GeoSeries:
    """Driver-side geometry series with Spark-dispatched pairwise ops."""

    _MIXED = -2

    def __init__(self, spark: SparkSession, layers: GeoLayers):
        self.spark = spark
        self.layers = layers
        kinds = {int(k) for k in layers.feature_types if k != NONE}
        if len(kinds) > 1:
            self._kind_code = self._MIXED
        else:
            self._kind_code = kinds.pop() if kinds else NONE

    # ------------------------------------------------------ constructors

    @classmethod
    def from_wkt(cls, spark: SparkSession, wkts) -> "GeoSeries":
        return cls(spark, from_geopandas(from_wkt(wkts)))

    @classmethod
    def from_geopandas(cls, spark: SparkSession, geoms) -> "GeoSeries":
        return cls(spark, from_geopandas(geoms))

    # ---------------------------------------------------------- basics

    def __len__(self):
        return len(self.layers)

    @property
    def kind(self) -> str:
        if self._kind_code == self._MIXED:
            return "mixed"
        return _KIND_NAMES.get(self._kind_code, "none")

    @property
    def sizes(self) -> np.ndarray:
        return self.layers.sizes()

    def iloc(self, indices) -> "GeoSeries":
        return GeoSeries(self.spark, self.layers.iloc(indices))

    def to_wkt(self) -> list:
        return to_wkt(self.layers)

    def to_geoms(self):
        return to_geoms(self.layers)

    def to_geopandas(self):
        from .io.geopandas import to_geopandas

        return to_geopandas(self.layers)

    # ------------------------------------------------- pairwise plumbing

    def _pair_df(self, other: "GeoSeries", row_ids=None) -> tuple[DataFrame, dict]:
        """Aligned pairwise DataFrame (row i = lhs i vs rhs i) with the
        column conventions of the dispatchers, plus the kwargs that
        name the index columns for this kind pair."""
        if len(self) != len(other):
            raise ValueError(
                f"length mismatch: {len(self)} vs {len(other)} "
                "(align the series first)"
            )
        n = len(self)
        cols: dict = {"row_id": np.arange(n) if row_ids is None else np.asarray(row_ids)}
        kw: dict = {}

        idx_names = {
            MULTIPOINT: "multipoint_index",
            LINESTRING: "linestring_index",
            POLYGON: "polygon_index",
        }

        def side(series, is_lhs: bool, other_kind: int):
            u = series.layers.union_offsets
            k = series._kind_code
            if k == POINT:
                xs = series.layers.point_x[u]
                ys = series.layers.point_y[u]
                # dispatcher convention: x2/y2 only when BOTH sides
                # are points; otherwise the point side is always x/y
                if is_lhs or other_kind != POINT:
                    cols["x"], cols["y"] = xs, ys
                else:
                    cols["x2"], cols["y2"] = xs, ys
            elif k in idx_names:
                # same-kind pairs use lhs_index/rhs_index; mixed pairs
                # use the kind-specific column name
                if k == other_kind:
                    cols["lhs_index" if is_lhs else "rhs_index"] = u
                else:
                    cols[idx_names[k]] = u
            else:
                raise ValueError("empty GeoSeries side")

        side(self, True, other._kind_code)
        side(other, False, self._kind_code)
        return self.spark.createDataFrame(pd.DataFrame(cols)), kw

    def _layer_of(self, for_predicate: bool = False):
        """Geometry-level layer container.  Multi-part rows: the
        distance family accepts Multi* containers directly (min over
        parts); predicates use the flattened even-odd polygon view for
        multipolygons, and multilinestrings answer intersects/disjoint
        via the dispatcher's distance closure."""
        k = self._kind_code
        if k == MULTIPOINT:
            return self.layers.multipoints
        if k == LINESTRING:
            # multi-part rows pass the Multi container through; the
            # binpred dispatcher answers intersects/disjoint via the
            # distance closure and raises for the rest
            return self.layers.linestring_layer()
        if k == POLYGON:
            if for_predicate:
                return self.layers.polygon_flat_layer()
            return self.layers.polygon_layer()
        return None

    # --------------------------------------------- mixed-kind sub-dispatch

    def _kind_groups(self, other: "GeoSeries"):
        """Partition aligned rows by their (lhs_kind, rhs_kind) pair —
        the per-kind sub-dispatch of the reference's GeoColumn union
        (geocolumn.py:30-66): each homogeneous group runs through the
        single-kind dispatcher, results reassemble on row_id."""
        if len(self) != len(other):
            raise ValueError(
                f"length mismatch: {len(self)} vs {len(other)} "
                "(align the series first)"
            )
        lt = np.asarray(self.layers.feature_types)
        rt = np.asarray(other.layers.feature_types)
        keys = lt.astype(np.int64) * 16 + rt
        groups = []
        for key in np.unique(keys):
            idx = np.flatnonzero(keys == key)
            lk, rk = int(key) // 16, int(key) % 16
            if lk == NONE or rk == NONE:
                raise ValueError("pairwise op over missing (None) geometry rows")
            groups.append((idx, self.iloc(idx), other.iloc(idx)))
        return groups

    def _dispatch_pairwise(self, other: "GeoSeries", run, out_col: str) -> DataFrame:
        if self._kind_code != self._MIXED and other._kind_code != self._MIXED:
            df, kw = self._pair_df(other)
            return run(df, kw, self, other).select("row_id", out_col)
        parts = []
        for idx, sub_l, sub_r in self._kind_groups(other):
            df, kw = sub_l._pair_df(sub_r, row_ids=idx)
            parts.append(run(df, kw, sub_l, sub_r).select("row_id", out_col))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------ pairwise ops

    def distance(self, other: "GeoSeries") -> DataFrame:
        """Row i: distance(self[i], other[i]) — (row_id, distance)."""
        from .operators.dispatch import distance as _distance

        def run(df, kw, lhs, rhs):
            return _distance(
                df, lhs.kind, rhs.kind, lhs._layer_of(), rhs._layer_of(), **kw
            )

        return self._dispatch_pairwise(other, run, "distance")

    def _predicate(self, name: str, other: "GeoSeries") -> DataFrame:
        from .operators.binpred_dispatch import binpred

        def run(df, kw, lhs, rhs):
            return binpred(
                df, name, lhs.kind, rhs.kind,
                lhs._layer_of(for_predicate=True),
                rhs._layer_of(for_predicate=True),
                result=name, **kw,
            )

        return self._dispatch_pairwise(other, run, name)


def _install_predicates():
    for _p in _PREDICATES:
        def method(self, other, _p=_p):
            return self._predicate(_p, other)

        method.__name__ = _p
        method.__doc__ = (
            f"Row i: {_p}(self[i], other[i]) -> (row_id, {_p}) via "
            "operators/binpred_dispatch.binpred."
        )
        setattr(GeoSeries, _p, method)


_install_predicates()
