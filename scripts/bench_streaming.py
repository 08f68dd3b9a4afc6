#!/usr/bin/env python
"""Streaming ingest throughput: replay the sf events table as SBS-1
wire lines through the FULL stateful pipeline (parse → regex gate →
dispatch → applyInPandasWithState sessions/edges/debounce) and report
messages/second.

Context: the reference's live feed is a single dump1090 receiver at
~10-100 msg/s (SURVEY §6); its ingest path is one Python thread.  This
measures how far the Spark pipeline is from that envelope on one node.

Prints ONE JSON line {"metric": "streaming_ingest_rate", "value":
msgs_per_sec, ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from dump1090_postgis_spark.schemas import load_table
    from dump1090_postgis_spark.session import get_spark
    from dump1090_postgis_spark.streaming.pipeline import (
        event_stream,
        parsed_stream,
    )

    spark = get_spark(app_name="bench_streaming")
    ev = load_table(spark, SF_DIR, "events")

    # wire lines (same synthesis as the etl_full_pipeline query)
    line = F.concat_ws(
        ",",
        F.lit("MSG"), F.lit("3"), F.lit("1"), F.lit("1"),
        F.concat(F.lit("A"), F.col("user_id").cast("string")),
        F.lit("1"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyy/MM/dd"),
        F.date_format(F.col("ts").cast("timestamp"), "HH:mm:ss.SSS"),
        F.date_format(F.col("ts").cast("timestamp"), "yyyy/MM/dd"),
        F.date_format(F.col("ts").cast("timestamp"), "HH:mm:ss.SSS"),
        F.lit(""),
        F.round(F.col("value") * 10).cast("int").cast("string"),
        F.lit(""), F.lit(""),
        F.round(F.lit(47.0) + F.col("value") / 1000.0, 5).cast("string"),
        F.round(F.lit(-1.6) + F.col("value") / 1000.0, 5).cast("string"),
        F.lit(""), F.lit(""), F.lit("0"), F.lit(""), F.lit("0"),
        F.when(F.col("event_id") % 7 == 0, "-1").otherwise("0"),
    )

    drop = tempfile.mkdtemp(prefix="ingest_drop")
    ckpt = tempfile.mkdtemp(prefix="ingest_ckpt")
    try:
        ev.select(line.alias("value")).coalesce(8).write.mode(
            "overwrite"
        ).text(drop)
        n_msgs = spark.read.text(drop).count()

        raw = spark.readStream.text(drop)
        events = event_stream(parsed_stream(raw))
        t0 = time.time()
        q = (
            events.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # ProcessingTimeTimeout keeps the availableNow query scheduling
        # empty micro-batches until every session ages past MAX_AGE
        # (300 s of processing time) — that drain phase is eviction
        # semantics, not ingest throughput.  Stop at the first
        # zero-input progress event: all data batches are done by then.
        deadline = time.time() + 600
        elapsed = None
        while time.time() < deadline and q.isActive:
            p = q.lastProgress
            if p and p.get("numInputRows", 0) == 0 and p.get("batchId", 0) > 0:
                elapsed = time.time() - t0
                q.stop()
                break
            time.sleep(0.2)
        if elapsed is None:
            q.awaitTermination(60)
            elapsed = time.time() - t0
        rate = n_msgs / elapsed
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
        print(json.dumps({
            "metric": "streaming_ingest_rate",
            "value": round(rate, 1),
            "unit": "msgs_per_sec",
            "messages": n_msgs,
            "elapsed_sec": round(elapsed, 2),
            "sf": sf,
        }))
    finally:
        shutil.rmtree(drop, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
