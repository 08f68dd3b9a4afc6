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
