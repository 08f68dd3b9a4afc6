"""Unit tests for datapipe/scd.py (SCD2 interval compaction)."""

from __future__ import annotations

from dump1090_postgis_spark.datapipe.scd import scd2_intervals


def _snaps(spark, rows):
    return spark.createDataFrame(
        rows, "snapshot_id int, doc_id long, text_hash string"
    )


def test_scd2_change_splits_run(spark):
    df = _snaps(spark, [(1, 1, "x"), (2, 1, "x"), (3, 1, "y")])
    out = sorted(scd2_intervals(df).collect(), key=lambda r: r.from_snap)
    assert [(r.text_hash, r.from_snap, r.to_snap, r.n_snaps, r.is_current)
            for r in out] == [("x", 1, 2, 2, False), ("y", 3, 3, 1, True)]


def test_scd2_gap_splits_run_even_with_same_hash(spark):
    """Delete + re-insert with identical content = two runs (the
    tombstone semantics a warehouse MERGE records)."""
    df = _snaps(spark, [(1, 7, "x"), (3, 7, "x")])
    out = sorted(scd2_intervals(df).collect(), key=lambda r: r.from_snap)
    assert [(r.from_snap, r.to_snap, r.is_current) for r in out] == [
        (1, 1, False),
        (3, 3, True),
    ]


def test_scd2_is_current_uses_global_max_snapshot(spark):
    """A doc absent from the overall-latest snapshot is not current,
    even if its own last run ends at its own max snapshot."""
    df = _snaps(spark, [(1, 1, "x"), (2, 1, "x"), (1, 2, "z"), (2, 2, "z"), (3, 2, "z")])
    out = {r.doc_id: r for r in scd2_intervals(df).collect()}
    assert out[1].is_current is False and out[1].to_snap == 2
    assert out[2].is_current is True and (out[2].from_snap, out[2].to_snap) == (1, 3)


def test_scd2_explicit_current_snap(spark):
    df = _snaps(spark, [(1, 1, "x")])
    (row,) = scd2_intervals(df, current_snap=1).collect()
    assert row.is_current is True


def test_corpus_diff_null_text_is_not_an_existence_signal(spark):
    """md5 of NULL text is NULL — presence must come from per-side
    flags, not hash nullness, or a NULL-text doc present on both sides
    reads as added/removed and changed_set re-runs the wrong docs."""
    from dump1090_postgis_spark.datapipe.versioning import (
        changed_set,
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "now text"), (2, None), (3, "same"), (5, "fresh")],
        "doc_id long, text string",
    )
    st = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert st == {
        1: "changed",    # NULL -> text (was misread as 'added')
        2: "unchanged",  # NULL -> NULL
        3: "unchanged",
        4: "removed",
        5: "added",
    }
    work = {r.doc_id for r in changed_set(old, new).collect()}
    assert work == {1, 5}


def test_scd2_null_hash_breaks_the_run(spark):
    """A NULL content hash is a content change: plain != left the OR
    NULL and the run never split — emitting OVERLAPPING intervals."""
    from dump1090_postgis_spark.datapipe.scd import scd2_intervals

    snaps = spark.createDataFrame(
        [(7, 1, "h1"), (7, 2, None), (7, 3, "h1")],
        "doc_id long, snapshot_id int, text_hash string",
    )
    rows = sorted(
        (r.from_snap, r.to_snap, r.text_hash, r.n_snaps)
        for r in scd2_intervals(snaps, "doc_id", "text_hash").collect()
    )
    assert rows == [(1, 1, "h1", 1), (2, 2, None, 1), (3, 3, "h1", 1)]
    # intervals are disjoint and cover 1..3
    spans = [(a, b) for a, b, _, _ in rows]
    assert all(b1 < a2 for (_, b1), (a2, _) in zip(spans, spans[1:]))
