"""Storage layout writers: date partition pruning reaches the scan,
clustered writes co-locate keys, bucketed tables skip the join
shuffle."""

import datetime

from pyspark.sql import functions as F

from dump1090_postgis_spark.operators.storage import (
    write_bucketed,
    write_clustered,
    write_time_partitioned,
)

D = datetime.datetime


def _positions(spark):
    rows = [
        (i, i % 5, D(2024, 5, 1 + i % 3, 10, 0, i))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "id long, flight_id long, time timestamp")


def test_time_partitioned_pruning(spark, tmp_path):
    path = str(tmp_path / "pos_by_day")
    write_time_partitioned(_positions(spark), path)
    df = spark.read.parquet(path)
    pruned = df.filter(F.col("_dt") == "2024-05-02")
    assert pruned.count() == 20
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter (not a data filter) → pruned at planning
    assert "_dt" in plan


def test_clustered_write_colocates_keys(spark, tmp_path):
    path = str(tmp_path / "pos_clustered")
    write_clustered(_positions(spark), path, num_partitions=4)
    df = spark.read.parquet(path)
    # every flight's rows land in exactly one file
    per_key_files = (
        df.withColumn("_f", F.input_file_name())
        .groupBy("flight_id")
        .agg(F.countDistinct("_f").alias("nf"))
        .collect()
    )
    assert all(r.nf == 1 for r in per_key_files)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    write_bucketed(_positions(spark), "pos_bucketed", num_buckets=4)
    t = spark.table("pos_bucketed")
    agg = t.groupBy("flight_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert agg.count() == 5
    # the groupBy rides the bucketing: no exchange before the agg
    assert "Exchange hashpartitioning(flight_id" not in plan
    spark.sql("DROP TABLE IF EXISTS pos_bucketed")


def _py_morton(vals, bounds, bits):
    """Independent reference: quantize then interleave MSB-first."""
    qs = []
    for x, (lo, hi) in zip(vals, bounds):
        frac = (min(hi, max(lo, float(x))) - lo) / (hi - lo)
        qs.append(min((1 << bits) - 1, int(frac * (1 << bits))))
    n = len(qs)
    key = 0
    for bit in range(bits):
        for ci, q in enumerate(qs):
            key |= ((q >> bit) & 1) << (bit * n + (n - 1 - ci))
    return key


def test_zorder_key_matches_morton_reference(spark):
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.operators.storage import zorder_key

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (9, 9), (3, 7), (7, 3), (10, 0), (0, 10), (5.5, 2.2)]
    )]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r.id: r.z
        for r in df.select(
            "id", zorder_key([("x", 0.0, 10.0), ("y", 0.0, 10.0)], bits=4).alias("z")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == _py_morton([x, y], [(0.0, 10.0), (0.0, 10.0)], 4), (i, x, y)


def test_zorder_layout_skips_files_on_either_dimension(spark, tmp_path):
    """Z-ordered files must each cover a small rectangle of
    (user_id, value): a range predicate on EITHER column overlaps only
    a minority of files — single-column sorting can't do both."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.operators.storage import write_zordered

    rows = [(i, i % 100, float((i * 37) % 400)) for i in range(4000)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    path = str(tmp_path / "zordered")
    write_zordered(
        df, path, [("user_id", 0.0, 100.0), ("value", 0.0, 400.0)],
        bits=8, num_partitions=16,
    )
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        )
        .collect()
    )
    n = len(per_file)
    assert n >= 8  # the layout actually split into many files
    # files whose min/max stats overlap a narrow predicate range
    u_hits = sum(1 for r in per_file if r.ulo <= 25 and r.uhi >= 0)
    v_hits = sum(1 for r in per_file if r.vlo <= 100.0 and r.vhi >= 0.0)
    assert u_hits <= n / 2, [(r.ulo, r.uhi) for r in per_file]
    assert v_hits <= n / 2, [(r.vlo, r.vhi) for r in per_file]


def test_zorder_key_rejects_sign_bit_overflow(spark):
    import pytest

    from dump1090_postgis_spark.operators.storage import zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key([(c, 0.0, 1.0) for c in "abcd"], bits=16)


def test_bbox_read_skips_zordered_files_and_pushes_predicates(spark, tmp_path):
    """Read-side proof of the z-order layout (the reference's
    QGIS-over-GiST bbox workload): the bbox predicates reach the
    parquet scan as pushed filters, and the z-ordered layout leaves
    most files entirely outside the box (their min/max stats don't
    overlap it) while a round-robin layout makes every file overlap."""
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.operators.storage import write_zordered
    from dump1090_postgis_spark.plans.testdata_queries import (
        _BBOX,
        positions_in_bbox,
    )
    from dump1090_postgis_spark.schemas import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    pos = ev.select(
        "event_id",
        F.col("value").alias("longitude"),
        (F.pmod(F.col("event_id"), F.lit(18000)) / F.lit(100.0) - F.lit(90.0)).alias(
            "latitude"
        ),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(
        pos, zpath, [("longitude", 0.0, 500.0), ("latitude", -90.0, 90.0)],
        bits=12, num_partitions=24,
    )
    upath = str(tmp_path / "unordered")
    pos.repartition(24).write.parquet(upath)

    out = positions_in_bbox(spark, zpath, *_BBOX)
    # default maxMetadataStringLength truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(longitude" in plan
    assert "LessThanOrEqual(latitude" in plan

    def overlap_fraction(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("longitude").alias("xlo"), F.max("longitude").alias("xhi"),
                F.min("latitude").alias("ylo"), F.max("latitude").alias("yhi"),
            )
            .collect()
        )
        lon_min, lon_max, lat_min, lat_max = _BBOX
        hits = sum(
            1
            for r in per_file
            if r.xhi >= lon_min and r.xlo <= lon_max
            and r.yhi >= lat_min and r.ylo <= lat_max
        )
        return hits, len(per_file)

    z_hits, z_n = overlap_fraction(zpath)
    u_hits, u_n = overlap_fraction(upath)
    assert u_hits == u_n  # round-robin: every file overlaps the box
    assert z_n >= 12
    assert z_hits <= z_n / 2, (z_hits, z_n)  # z-order: most files skipped
    # and the query returns the same rows either way
    assert out.count() == spark.read.parquet(upath).filter(
        (F.col("longitude") >= _BBOX[0]) & (F.col("longitude") <= _BBOX[1])
        & (F.col("latitude") >= _BBOX[2]) & (F.col("latitude") <= _BBOX[3])
    ).count()
