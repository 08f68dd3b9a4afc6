"""Geometry parity with the reference's most rigorous suite
(test_airports.py): point-in-polygon on the real NTE runway
quadrilateral, heading tolerance boundaries (±20° exactly), runway
attribution with bbox fallback and priority."""

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.functions.geo import point_in_polygon, same_heading
from dump1090_postgis_spark.operators.attribution import attribute_runway
from dump1090_postgis_spark.sources.dims import nte_airport, nte_runways

# Points relative to the real NTE geometry (airports.py:129-164):
ON_RUNWAY = (-1.6113635, 47.15234925)     # centroid of the strip quad
OFF_RUNWAY_IN_AIRPORT = (-1.606000, 47.153500)  # inside bbox, off strip
FAR_AWAY = (-1.500000, 47.000000)


def _contains(spark, pt, poly_df, poly_col):
    df = spark.createDataFrame([pt], "px double, py double")
    return (
        df.crossJoin(poly_df)
        .select(point_in_polygon(F.col("px"), F.col("py"), F.col(poly_col)).alias("c"))
        .collect()
    )


def test_point_in_runway(spark):
    rws = nte_runways(spark).limit(1)
    assert _contains(spark, ON_RUNWAY, rws, "polygon")[0].c is True
    assert _contains(spark, OFF_RUNWAY_IN_AIRPORT, rws, "polygon")[0].c is False
    assert _contains(spark, FAR_AWAY, rws, "polygon")[0].c is False


def test_point_in_airport_bbox(spark):
    ap = nte_airport(spark)
    assert _contains(spark, OFF_RUNWAY_IN_AIRPORT, ap, "bbox")[0].c is True
    assert _contains(spark, FAR_AWAY, ap, "bbox")[0].c is False


@pytest.mark.parametrize(
    "direction,heading,expected",
    [
        (30, 30, True),
        (30, 50, True),    # exactly +20 → in (<=)
        (30, 10, True),    # exactly -20 → in
        (30, 50.1, False),
        (30, 9.9, False),
        (30, 210, False),  # inverse runway
        (210, 215, True),
    ],
)
def test_same_heading_tolerance(spark, direction, heading, expected):
    row = (
        spark.range(1)
        .select(same_heading(F.lit(direction), F.lit(float(heading))).alias("m"))
        .collect()[0]
    )
    assert row.m is expected


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, longitude double, latitude double, interp_track double"
    )


def test_attribution_exact_runway(spark):
    ev = _events(spark, [(1, *ON_RUNWAY, 32.0)])
    out = attribute_runway(ev, nte_runways(spark), nte_airport(spark)).collect()
    assert out[0].runway == "03"


def test_attribution_inverse_runway(spark):
    ev = _events(spark, [(1, *ON_RUNWAY, 212.0)])
    out = attribute_runway(ev, nte_runways(spark), nte_airport(spark)).collect()
    assert out[0].runway == "21"


def test_attribution_bbox_fallback(spark):
    # off the strip but inside the airport bbox with a matching heading
    ev = _events(spark, [(1, *OFF_RUNWAY_IN_AIRPORT, 28.0)])
    out = attribute_runway(ev, nte_runways(spark), nte_airport(spark)).collect()
    assert out[0].runway == "03"


def test_attribution_no_match(spark):
    ev = _events(spark, [(1, *FAR_AWAY, 28.0), (2, *ON_RUNWAY, 90.0)])
    out = {r.event_id: r.runway for r in
           attribute_runway(ev, nte_runways(spark), nte_airport(spark)).collect()}
    assert out[1] == "UNK"  # off airport
    assert out[2] == "UNK"  # on runway, wrong heading
    dropped = attribute_runway(
        ev, nte_runways(spark), nte_airport(spark), keep_unmatched=False
    )
    assert dropped.count() == 0


def test_attribution_explicit_strategy_skips_count_and_agrees(spark):
    """strategy='compile' / 'grid' must bypass the eager dim count
    (lazy plan building) and both must agree with 'auto' on the same
    events; an unknown strategy raises."""
    import pytest

    ev = _events(
        spark, [(1, *ON_RUNWAY, 32.0), (2, *ON_RUNWAY, 212.0), (3, *FAR_AWAY, 28.0)]
    )
    rw, ap = nte_runways(spark), nte_airport(spark)

    def result(**kw):
        return {
            r.event_id: r.runway for r in attribute_runway(ev, rw, ap, **kw).collect()
        }

    auto = result()
    assert result(strategy="compile") == auto
    assert result(strategy="grid") == auto
    with pytest.raises(ValueError, match="unknown attribution strategy"):
        attribute_runway(ev, rw, ap, strategy="bogus")


# ---------------------------------------------------------------------------
# Grid-cell broadcast-join scale path (branch budget exceeded)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "point,heading,expected",
    [
        (ON_RUNWAY, 32.0, "03"),               # direct hit
        (ON_RUNWAY, 212.0, "21"),              # reciprocal end
        (OFF_RUNWAY_IN_AIRPORT, 28.0, "03"),   # bbox fallback
        (FAR_AWAY, 28.0, "UNK"),               # off airport
        (ON_RUNWAY, 90.0, "UNK"),              # on strip, wrong heading
    ],
)
def test_attribution_join_path_parity(spark, point, heading, expected):
    """branch_budget=0 forces the grid-cell join path; every compiled-path
    scenario must attribute identically."""
    ev = _events(spark, [(1, *point, heading)])
    out = attribute_runway(
        ev, nte_runways(spark), nte_airport(spark), branch_budget=0
    ).collect()
    assert out[0].runway == expected


def test_attribution_join_path_plan_and_schema(spark):
    """The join path must be a broadcast hash join on the grid cell (no
    nested-loop over the runway dim), preserve the event schema +
    row count, and leave no helper columns behind."""
    ev = _events(spark, [(1, *ON_RUNWAY, 32.0), (2, *FAR_AWAY, 10.0)])
    out = attribute_runway(
        ev, nte_runways(spark), nte_airport(spark), branch_budget=0
    )
    assert out.columns == ev.columns + ["runway"]
    assert out.count() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_attribution_null_coords_and_heading(spark):
    """NULL lon/lat or heading rows stay rows and attribute to UNK in
    BOTH paths (compiled when() skips on NULL; join-path filter drops
    NULL predicates)."""
    ev = spark.createDataFrame(
        [(1, None, None, 30.0), (2, ON_RUNWAY[0], ON_RUNWAY[1], None)],
        "event_id long, longitude double, latitude double, interp_track double",
    )
    for budget in (256, 0):
        out = {
            r.event_id: r.runway
            for r in attribute_runway(
                ev, nte_runways(spark), nte_airport(spark), branch_budget=budget
            ).collect()
        }
        assert out == {1: "UNK", 2: "UNK"}


def test_point_in_polygon_sql_parity(spark):
    """SQL-text unrolled ray cast ≡ higher-order ray cast on every
    ring class it branches on: open/closed quads, concave rings,
    rings LONGER than the unroll budget (per-row fallback), degenerate
    2-vertex rings, and NULL polygons — over a point grid crossing all
    boundaries.  (round-13 opt: the unrolled form codegens and parses
    as one F.expr; the HOF form is the semantics oracle.)"""
    from dump1090_postgis_spark.functions.geo import (
        point_in_polygon_sql,
    )

    quad_open = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)]
    quad_closed = quad_open + [quad_open[0]]
    concave = [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (2.0, 1.0), (0.0, 3.0)]
    # 12-gon: size > PIP_UNROLL_EDGES → per-row fallback branch
    import math

    many = [
        (1.0 + math.cos(2 * math.pi * i / 12),
         1.0 + math.sin(2 * math.pi * i / 12))
        for i in range(12)
    ]
    degenerate = [(0.0, 0.0), (1.0, 1.0)]
    polys = [quad_open, quad_closed, concave, many, degenerate, None]
    pts = [
        (x / 2.0 + 0.001, y / 2.0 + 0.001)
        for x in range(-1, 10)
        for y in range(-1, 8)
    ]
    rows = [
        (float(px), float(py),
         None if poly is None
         else [{"lon": lon, "lat": lat} for lon, lat in poly])
        for px, py in pts
        for poly in polys
    ]
    df = spark.createDataFrame(
        rows, "px double, py double, poly array<struct<lon:double,lat:double>>"
    )
    out = df.select(
        point_in_polygon(F.col("px"), F.col("py"), F.col("poly")).alias("hof"),
        F.expr(point_in_polygon_sql("`px`", "`py`", "`poly`")).alias("unr"),
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.hof == r.unr, r


def test_grid_first_match_unrolled_parity(spark):
    """Grid direct tier with MORE runways per cell than the unroll
    budget: 6 overlapping same-cell quads (only #4 and #6 match the
    heading) must still attribute first-match-in-iteration-order via
    the per-row fallback branch, and a matched runway keeps winning
    when it is not the first array element."""
    from dump1090_postgis_spark.operators.attribution import (
        CELL_SCAN_UNROLL,
    )

    n = CELL_SCAN_UNROLL + 2
    sq = [(0.0, 0.0), (0.2, 0.0), (0.2, 0.2), (0.0, 0.2)]
    rows = [
        (
            f"R{i:02d}",
            # only the last two runways match heading 30
            30.0 if i >= n - 2 else 210.0,
            [{"lon": x, "lat": y} for x, y in sq],
        )
        for i in range(n)
    ]
    rw = spark.createDataFrame(
        rows,
        "name string, direction double, polygon array<struct<lon:double,lat:double>>",
    )
    ev = _events(spark, [(1, 0.1, 0.1, 30.0), (2, 5.0, 5.0, 30.0)])
    out = {
        r.event_id: r.runway
        for r in attribute_runway(
            ev, rw, None, branch_budget=0,
            lon="longitude", lat="latitude", heading="interp_track",
        ).collect()
    }
    # first match in (name, direction) iteration order among heading
    # matchers = R04 (n-2); event 2 is outside every polygon
    assert out == {1: f"R{n - 2:02d}", 2: "UNK"}
