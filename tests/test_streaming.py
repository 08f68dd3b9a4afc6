"""Streaming pipeline: the applyInPandasWithState session handler must
reproduce the reference state machine (edges, debounce, field
accumulation) on a replayed capture — and agree with the batch path."""

import os
import shutil
import tempfile
import time

import pytest

LINES = [
    # approach: descending positions, then onground flip (landing)
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:00.000,2024/05/01,10:00:00.000,,500,,,47.1480,-1.6160,,,0,,0,0",
    "MSG,1,1,1,AAA111,1,2024/05/01,10:00:02.000,2024/05/01,10:00:02.000,TST100 ,,,,,,,,0,,0,0",
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:05.000,2024/05/01,10:00:05.000,,200,,,47.1500,-1.6140,,,0,,0,0",
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:10.000,2024/05/01,10:00:10.000,,50,,,47.1523,-1.6114,,,0,,0,-1",
    # bounce airborne 1.5s later (takeoff candidate — suppressed by
    # debounce), then back onground 10s later → a second landing
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:11.500,2024/05/01,10:00:11.500,,50,,,47.1530,-1.6107,,,0,,0,0",
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:21.500,2024/05/01,10:00:21.500,,80,,,47.1540,-1.6100,,,0,,0,-1",
    # second aircraft, no events
    "MSG,3,1,1,BBB222,1,2024/05/01,10:00:03.000,2024/05/01,10:00:03.000,,9000,,,47.5000,-1.2000,,,0,,0,0",
]


@pytest.fixture(scope="module")
def stream_events(spark):
    drop = tempfile.mkdtemp(prefix="sbs1drop")
    ckpt = tempfile.mkdtemp(prefix="sbs1ckpt")
    with open(os.path.join(drop, "capture.txt"), "w") as f:
        f.write("\n".join(LINES))
    from dump1090_postgis_spark.streaming.pipeline import (
        event_stream,
        parsed_stream,
    )

    raw = spark.readStream.text(drop)
    q = (
        event_stream(parsed_stream(raw))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ev")
        .option("checkpointLocation", ckpt)
        .start()
    )
    # processAllAvailable() never returns under ProcessingTimeTimeout
    # (state-cleanup batches keep scheduling) — poll until rows appear.
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("select * from stream_ev").count() >= 2:
            break
        time.sleep(2)
    rows = spark.sql("select * from stream_ev order by event_time").collect()
    q.stop()
    shutil.rmtree(drop, ignore_errors=True)
    yield rows


def test_stream_emits_debounced_edges(stream_events):
    kinds = [(r.hexident, r.kind) for r in stream_events]
    # takeoff candidate at +1.5 s suppressed; both landings survive
    assert kinds == [("AAA111", "landing"), ("AAA111", "landing")]


def test_stream_event_attributes(stream_events):
    landing = stream_events[0]
    assert landing.callsign == "TST100"          # trimmed, accumulated
    assert landing.longitude == pytest.approx(-1.6114)
    assert landing.n_messages == 4
    assert landing.track is not None and 0 <= landing.track < 360


def test_stream_matches_batch_path(spark, stream_events):
    """The deterministic batch analog (sessionize→edges→debounce) must
    find the same events on the same input."""
    import pyspark.sql.functions as F

    from dump1090_postgis_spark.operators import parse
    from dump1090_postgis_spark.operators.events import (
        debounce_events,
        detect_onground_edges,
    )
    from dump1090_postgis_spark.operators.sessionize import sessionize

    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    msgs = parse.dispatch_fields(parse.parse_sbs1_lines(df))
    # events fire only from valid-position MSG2/MSG3 rows
    # (models.py:196-215) — same rule the streaming handler applies
    sess = parse.position_validity(sessionize(msgs))
    edges = debounce_events(detect_onground_edges(sess))
    batch = [
        (r.hexident, r.event_type, r.gen_date_time)
        for r in edges.orderBy("gen_date_time").collect()
    ]
    stream = [(r.hexident, r.kind, r.event_time) for r in stream_events]
    assert batch == stream
