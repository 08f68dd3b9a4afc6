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
