"""cuProj-parity WGS84<->UTM transformer (reference
python/cuproj/cuproj/transformer.py:6-100) — validated against
published invariants since pyproj/cuproj are unavailable: a known
landmark fix, the meridian-arc length, central-meridian identities,
and sub-nanodegree round-trips."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuspatial_spark.functions.cuproj import Transformer


class TestTransformer:
    def test_known_fix_cn_tower(self, spark):
        # commonly published: 43.642567N 79.387139W -> 17N 630084 4833438
        df = spark.createDataFrame(
            pd.DataFrame({"lon": [-79.387139], "lat": [43.642567]})
        )
        got = (
            Transformer.from_crs("epsg:4326", "epsg:32617")
            .transform(df, "lon", "lat", "E", "N")
            .collect()[0]
        )
        assert abs(got["E"] - 630084) < 2
        assert abs(got["N"] - 4833438) < 2

    def test_central_meridian_and_meridian_arc(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"lon": [15.0, 15.0], "lat": [0.0, 45.0]})
        )
        got = (
            Transformer.from_crs("epsg:4326", "epsg:32633")
            .transform(df, "lon", "lat", "E", "N")
            .collect()
        )
        assert abs(got[0]["E"] - 500000.0) < 1e-6  # on the CM
        assert abs(got[0]["N"]) < 1e-6  # equator
        # WGS84 meridian distance 0->45deg = 4984944.378 m, scaled by k0
        assert abs(got[1]["N"] - 4984944.378 * 0.9996) < 0.5

    def test_roundtrip_and_south(self, spark):
        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {"lon": rng.uniform(9, 21, 300), "lat": rng.uniform(-75, 80, 300)}
        )
        df = spark.createDataFrame(pdf)
        fwd = Transformer.from_crs("EPSG:4326", "EPSG:32633").transform(
            df, "lon", "lat", "E", "N"
        )
        inv = Transformer.from_crs("EPSG:32633", "EPSG:4326").transform(
            fwd, "E", "N", "lon2", "lat2"
        )
        err = inv.select(
            F.max(F.abs(F.col("lon2") - F.col("lon"))).alias("e1"),
            F.max(F.abs(F.col("lat2") - F.col("lat"))).alias("e2"),
        ).collect()[0]
        assert err["e1"] < 1e-9 and err["e2"] < 1e-9
        # southern hemisphere false northing
        dfs = spark.createDataFrame(pd.DataFrame({"lon": [15.0], "lat": [-30.0]}))
        south = (
            Transformer.from_crs("epsg:4326", "epsg:32733")
            .transform(dfs, "lon", "lat", "E", "N")
            .collect()[0]
        )
        assert 0 < south["N"] < 10000000

    def test_pure_jvm_plan_and_errors(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"lon": [1.0], "lat": [2.0]}))
        t = Transformer.from_crs("epsg:4326", "epsg:32631")
        plan = (
            t.transform(df, "lon", "lat")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
        with pytest.raises(ValueError):
            Transformer.from_crs("epsg:4326", "epsg:3857")
        with pytest.raises(ValueError):
            Transformer.from_crs("esri:102001", "epsg:32631")
