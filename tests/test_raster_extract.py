"""Tests for HTML->text extraction (byte-identity invariant) and
raster<->vector conversion."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuspatial_spark.geometry import PolygonArrays
from cuspatial_spark.operators.raster import (
    grid_cells,
    rasterize_polygons,
    vectorize_cells,
)
from cuspatial_spark.textops.extract import extract_text, extract_text_expr, wrap_html
from tests.golden_fixtures import (
    SMALL_POLY_OFFSETS,
    SMALL_POLY_XS,
    SMALL_POLY_YS,
    SMALL_RING_OFFSETS,
)


# ------------------------------------------------------------------ extract

ADVERSARIAL_TEXTS = [
    "plain body text",
    "amp & lt < gt > quote \" apos ' mix",
    "pre-encoded looking &amp; &lt; &#39; sequences survive",
    "multi\nline\n\ttext with   spaces",
    "trailing & ampersand &",
    "",  # empty body
]


def test_wrap_extract_byte_identity(spark):
    """The north-rule invariant: wrap -> extract returns the original
    bytes for every row, including entity-dense and multiline text."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ADVERSARIAL_TEXTS)), "text": ADVERSARIAL_TEXTS})
    )
    out = (
        extract_text(wrap_html(docs), "html")
        .select("doc_id", "text", "extracted_text")
        .orderBy("doc_id")
        .collect()
    )
    for row in out:
        assert row.extracted_text == row.text, row.doc_id


def test_wrap_extract_synth_webpages(spark):
    """End-to-end on the synthetic Common-Crawl-style source: the html
    column's extraction equals the text column byte-for-byte per url."""
    from cuspatial_spark.sources.webpages import synth_webpages

    pages = synth_webpages(spark, 2000, partitions=8)
    mismatches = (
        extract_text(pages, "html")
        .where(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_extract_handwritten_html(spark):
    html = (
        '<!DOCTYPE html><html><head><title></title>'
        '<script>if (a < b) { s = "</div>"; }</script>'
        "<style>p > a { color: red }</style></head>"
        "<!-- <p>commented out</p> -->"
        '<body><div id="main">Hello &amp; welcome</div></body></html>'
    )
    got = (
        spark.range(1)
        .select(extract_text_expr(F.lit(html)).alias("t"))
        .collect()[0]
        .t
    )
    assert got == "Hello & welcome"


# ------------------------------------------------------------------ raster

GRID = dict(width=32, height=32, x_min=0.0, y_min=0.0, cell_size=0.25)


def _golden_polys():
    return PolygonArrays(SMALL_POLY_OFFSETS, SMALL_RING_OFFSETS, SMALL_POLY_XS, SMALL_POLY_YS)


def _brute_cells():
    """NumPy oracle: center-sample PIP bitmask over the golden layer."""
    from cuspatial_spark.kernels.pip import point_in_polygon_bits

    w, h, cs = GRID["width"], GRID["height"], GRID["cell_size"]
    ii, jj = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    cx = GRID["x_min"] + (ii + 0.5) * cs
    cy = GRID["y_min"] + (jj + 0.5) * cs
    bits = point_in_polygon_bits(
        cx, cy, np.asarray(SMALL_POLY_OFFSETS), np.asarray(SMALL_RING_OFFSETS),
        np.asarray(SMALL_POLY_XS), np.asarray(SMALL_POLY_YS),
    )
    n_polys = len(SMALL_POLY_OFFSETS) - 1
    return {
        (int(ii[p]), int(jj[p]), q)
        for p in range(len(bits))
        for q in range(n_polys)
        if bits[p] & (1 << q)
    }


def test_rasterize_matches_numpy_oracle(spark):
    got = {
        (r.i, r.j, r.polygon_id)
        for r in rasterize_polygons(spark, _golden_polys(), **GRID).collect()
    }
    assert got == _brute_cells()


def test_vectorize_exact_cover(spark):
    """Rectangles are disjoint per value and their union is exactly
    the input cell set (both directions)."""
    cells = rasterize_polygons(spark, _golden_polys(), **GRID)
    rects = vectorize_cells(
        cells, x_min=GRID["x_min"], y_min=GRID["y_min"], cell_size=GRID["cell_size"]
    ).collect()

    cs = GRID["cell_size"]
    covered = set()
    for r in rects:
        i0 = round((r.x0 - GRID["x_min"]) / cs)
        i1 = round((r.x1 - GRID["x_min"]) / cs)
        j0 = round((r.y0 - GRID["y_min"]) / cs)
        j1 = round((r.y1 - GRID["y_min"]) / cs)
        assert i1 > i0 and j1 > j0
        for i in range(i0, i1):
            for j in range(j0, j1):
                key = (i, j, r.value)
                assert key not in covered, "overlapping rectangles"
                covered.add(key)
    assert covered == _brute_cells()


def test_vectorize_merges_rectangles(spark):
    """A solid 4x3 block must come back as ONE rectangle."""
    cells = spark.createDataFrame(
        pd.DataFrame(
            [(i, j, 7) for i in range(2, 6) for j in range(1, 4)],
            columns=["i", "j", "polygon_id"],
        )
    )
    rects = vectorize_cells(cells, cell_size=1.0).collect()
    assert len(rects) == 1
    r = rects[0]
    assert (r.value, r.x0, r.y0, r.x1, r.y1) == (7, 2.0, 1.0, 6.0, 4.0)


def test_grid_cells_distributed(spark):
    df = grid_cells(spark, 8, 4, -1.0, 2.0, 0.5, partitions=4)
    rows = df.collect()
    assert len(rows) == 32
    one = [r for r in rows if r.i == 3 and r.j == 2][0]
    assert one.cx == pytest.approx(-1.0 + 3.5 * 0.5)
    assert one.cy == pytest.approx(2.0 + 2.5 * 0.5)
