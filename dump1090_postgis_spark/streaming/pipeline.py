"""End-to-end streaming pipeline assembly (SURVEY §3.1 Spark shape):

readStream(socket|text) → parse/normalize (select/filter, SRC-3 +
PRJ-1..4 + FLT-1/3) → groupByKey(hexident) → applyInPandasWithState
(sessions + edges + debounce, streaming.state) → [events stream] →
foreachBatch: runway attribution join (JOIN-5) + sinks (SNK-1 pacing
via trigger processingTime='1 second').

The reference's receiver thread + bounded queue + drop-all overflow
(STATE-7) disappear: Spark's source buffering and micro-batch
backpressure replace them; graceful shutdown is ``query.stop()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import parse
from ..streaming.state import (
    EVENT_OUTPUT_SCHEMA,
    STATE_SCHEMA,
    sessionize_updates,
)

COMMIT_PERIOD = "1 second"  # flights.py:20 DB_COMMIT_PERIOD


def parsed_stream(raw_lines: DataFrame, altitude_below: float = 10000.0) -> DataFrame:
    """Parse stage, identical for batch and streaming inputs.

    No global altitude filter: the reference applies the filter ONLY to
    the MSG3 admission test (flights.py:97-108 CASE B) — the stateful
    handler enforces it at admission (run.py:28 wires below=10000,
    which the handler's ADMISSION_* defaults mirror).
    """
    del altitude_below  # admission-time filtering lives in the handler
    msgs = parse.parse_sbs1_lines(raw_lines)
    msgs = parse.dispatch_fields(msgs)
    return msgs.select(
        "hexident", "gen_date_time", "transmission_type", "onground",
        "longitude", "latitude", "altitude", "callsign",
    )


def event_stream(parsed: DataFrame, watermark: str | None = None) -> DataFrame:
    """The stateful core: keyed session state emitting landing/takeoff
    events and timeout flight summaries.

    ``watermark`` (e.g. '5 minutes') enables the event-time mode
    (STATE-8) — the reference itself has NO watermark (its eviction is
    processing-time), so the default stays None for parity; pass one
    when composing with event-time windowed aggregations downstream.
    """
    if watermark is not None:
        parsed = parsed.withWatermark("gen_date_time", watermark)
    return parsed.groupBy("hexident").applyInPandasWithState(
        sessionize_updates,
        outputStructType=EVENT_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )


def windowed_event_counts(
    parsed: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    ts: str = "gen_date_time",
) -> DataFrame:
    """STATE-8: event-time tumbling-window message counts per aircraft
    with late-data handling (engine extension — the reference has NO
    watermark; its eviction is processing-time, flights.py:111-117).

    ``withWatermark`` bounds the aggregation state: a window finalizes
    (and, in append mode, emits exactly once) when the watermark passes
    its end, and rows later than the watermark are DROPPED rather than
    reopening emitted windows — the divergence-from-reference behavior
    SURVEY §2.8 says to document, here pinned by tests/test_streaming.
    """
    return (
        parsed.withWatermark(ts, watermark)
        .groupBy(F.window(ts, window).alias("win"), "hexident")
        .agg(F.count(F.lit(1)).alias("n_messages"))
        .select(
            F.col("win.start").alias("window_start"),
            "hexident",
            "n_messages",
        )
    )


def attributing_sink(
    runways: DataFrame,
    airport_bbox: DataFrame | None,
    inner_sink,
    lon: str = "longitude",
    lat: str = "latitude",
    heading: str = "track",
    tolerance_deg: float | None = None,
    keep_unmatched: bool = True,
):
    """foreachBatch wrapper running STATE-5/JOIN-5 runway attribution
    on each micro-batch of events before handing the attributed frame
    to ``inner_sink(batch_df, epoch_id)`` — the reference enriches its
    live events inside the commit thread (flights.py commit loop →
    models.py:283-286); here the enrichment is a per-batch plan
    against the static runway dim.

    ALL policy is shared with the batch operator — the
    compile-vs-grid gate is ``attribution.resolve_strategy`` (run ONCE
    at wire-up, not per batch), the compiled coalesce expression is
    attribution's own, and the unmatched handling is
    ``attribution.finish_unmatched`` — so the streaming path cannot
    drift from ``attribute_runway``.  On the compile path the literal
    Column is built once here and reused across every micro-batch (no
    per-batch driver work); on the grid path each batch runs the
    broadcast join (the dim broadcast is reused by the JVM across
    batches).  ``tolerance_deg``/``keep_unmatched`` pass through to
    the same knobs the batch operator exposes."""
    from ..operators.attribution import (
        GRID_DEG,
        HEADING_TOLERANCE_DEG,
        _compiled_coalesce,
        _grid_cell_join,
        finish_unmatched,
        grid_bbox_cells,
        grid_runway_cells,
        resolve_strategy,
        runway_dirs,
    )

    tol = HEADING_TOLERANCE_DEG if tolerance_deg is None else tolerance_deg
    strategy = resolve_strategy(runways, airport_bbox)
    if strategy == "compile":
        best = _compiled_coalesce(
            runways, airport_bbox, lon, lat, heading, tol
        )

        def sink(batch_df, epoch_id):
            inner_sink(
                finish_unmatched(
                    batch_df.withColumn("runway", best), keep_unmatched
                ),
                epoch_id,
            )

    else:
        # The grid twin of the compile branch's build-once discipline:
        # the per-cell runway/bbox dims and the heading-fallback array
        # are STATIC across micro-batches, so compute them ONCE at
        # wire-up and pin with an eager localCheckpoint — per batch the
        # plan is events → cell key → broadcast join → projection, no
        # dim window/explode/collect_list jobs (round-13: the per-batch
        # rebuild was part of the grid socket row's 0.161 keep-up).
        cell_rw = grid_runway_cells(runways).localCheckpoint(eager=True)
        cell_bb = dirs = None
        if airport_bbox is not None:
            cell_bb = grid_bbox_cells(airport_bbox).localCheckpoint(
                eager=True
            )
            dirs = runway_dirs(runways).localCheckpoint(eager=True)

        def sink(batch_df, epoch_id):
            inner_sink(
                finish_unmatched(
                    _grid_cell_join(
                        batch_df, runways, airport_bbox,
                        lon, lat, heading, tol, GRID_DEG,
                        cell_rw=cell_rw, cell_bb=cell_bb, dirs=dirs,
                    ),
                    keep_unmatched,
                ),
                epoch_id,
            )

    return sink


def resolve_stream_engine(engine: str = "auto") -> str:
    """Resolve the stateful-session engine: ``'tws'`` |  ``'legacy'``.

    ``'auto'`` (the default) selects ``'tws'``
    (``transformWithStateInPandas`` + RocksDB state store — the
    recommended 100 TB engine: off-heap spillable state, typed
    ValueState, explicit timers, 0.93× legacy throughput measured)
    whenever the Python↔JVM state-server transport is available
    (``pbcompat`` finds a same-major protobuf runtime), else falls
    back to the legacy ``applyInPandasWithState`` handler
    (HDFS-backed state, no protobuf requirement).  Both engines share
    ``state.advance_session`` — one state machine, two APIs, parity
    pinned by tests."""
    if engine not in ("auto", "tws", "legacy"):
        raise ValueError(f"engine must be auto|tws|legacy, got {engine!r}")
    if engine != "auto":
        return engine
    from .pbcompat import prepare_env, tws_available

    return "tws" if (prepare_env() and tws_available()) else "legacy"


def start_pipeline(
    raw_stream: DataFrame,
    sink_fn,
    checkpoint_dir: str,
    trigger: str = COMMIT_PERIOD,
    runways: DataFrame | None = None,
    airport_bbox: DataFrame | None = None,
    engine: str = "auto",
):
    """Wire the stages and start the query.  ``sink_fn(batch_df,
    epoch_id)`` receives each micro-batch of events (foreachBatch =
    SNK-1's transactional batched writes).  Pass ``runways`` (and
    optionally ``airport_bbox``) to run STATE-5 runway attribution
    inside the batch sink — ``sink_fn`` then receives events WITH the
    ``runway`` column, matching the batch ETL's attributed edges.

    ``engine``: ``'auto'`` (default — TWS when available, see
    :func:`resolve_stream_engine`), ``'tws'``, or ``'legacy'``.  On
    the TWS path this (a) verifies ``checkpoint_dir`` wasn't written
    by an incompatibly-named state schema
    (:func:`..streaming.tws.assert_checkpoint_state_compatible` —
    Spark would otherwise restart CLEANLY and silently drop in-flight
    sessions), and (b) sets the session's state-store provider to
    RocksDB if no provider is configured (TWS requires it; RocksDB is
    also valid for any concurrently-started legacy query)."""
    resolved = resolve_stream_engine(engine)
    if resolved == "tws":
        from .tws import (
            ROCKSDB_PROVIDER,
            assert_checkpoint_state_compatible,
            event_stream_tws,
        )

        assert_checkpoint_state_compatible(checkpoint_dir)
        spark = raw_stream.sparkSession
        key = "spark.sql.streaming.stateStore.providerClass"
        if spark.conf.get(key, None) in (None, ""):
            spark.conf.set(key, ROCKSDB_PROVIDER)
        events = event_stream_tws(parsed_stream(raw_stream))
    else:
        # the mirror-image guard: engine='auto' resolves to 'legacy'
        # when the protobuf transport is ABSENT — if the checkpoint
        # was written by a TWS run (protobuf since removed/downgraded),
        # restarting the applyInPandasWithState handler over it yields
        # at best an opaque state-store failure and at worst silently
        # dropped in-flight sessions, with the engine flip never
        # surfaced to the operator.
        from .tws import _latest_tws_metadata

        if _latest_tws_metadata(checkpoint_dir, 0) is not None:
            raise RuntimeError(
                f"checkpoint {checkpoint_dir!r} was written by the TWS "
                "(transformWithState) engine, but the resolved engine "
                f"is {resolved!r} (protobuf transport unavailable or "
                "engine forced). Restore the protobuf runtime (or pass "
                "engine='tws'), or start the legacy engine on a FRESH "
                "checkpoint directory."
            )
        events = event_stream(parsed_stream(raw_stream))
    if runways is not None:
        sink_fn = attributing_sink(runways, airport_bbox, sink_fn)
    return (
        events.writeStream.outputMode("append")
        .foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    before: str = "5 minutes",
    after: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left row matches
    right rows with the same ``on`` key whose event time falls in
    [left_ts - before, left_ts + after].

    The reference has no streaming join — its event enrichment
    (STATE-5) joins a live stream against STATIC dims inside the
    commit thread.  This is the Spark-native generalization for
    stream×stream enrichment (e.g. landing events × position fixes):
    both sides carry a watermark and the join condition carries a
    time-range predicate, which is exactly what Structured Streaming
    needs to BOUND the join state store — rows older than
    watermark + interval are evicted, so state is O(rate × window),
    not O(stream).  Append output mode only (results final once the
    watermark passes).

    Columns surface with ``l_`` / ``r_`` prefixes (except the shared
    key) so downstream selects never hit ambiguous attributes.
    """
    l = left.withWatermark(left_ts, watermark).select(
        F.col(on).alias("_k"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != on],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(on).alias("_rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    lts, rts = F.col(f"l_{left_ts}"), F.col(f"r_{right_ts}")
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (rts >= lts - F.expr(f"INTERVAL {before}"))
        & (rts <= lts + F.expr(f"INTERVAL {after}"))
    )
    return l.join(r, cond, "inner").drop("_rk").withColumnRenamed("_k", on)


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, dropping
    re-deliveries that land within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` is the bounded-state form —
    per-key state is evicted once the watermark passes its event time,
    so state is O(rate × horizon), not O(stream) (plain
    ``dropDuplicates`` on a stream retains every key forever).  The
    batch analog is datapipe/dedup.exact_dedup; at-least-once sources
    (replayed sockets, kafka) are the reason this exists.
    """
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
