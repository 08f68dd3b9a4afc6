"""Sources & sinks: CSV dimension loaders (SRC-4), binaryFile image
scan (SRC-5), live-retention view (SNK-2/3), id-remap copy (SNK-5),
conversion helpers."""

import datetime
import os
import struct

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.functions.conversions import (
    angle2compass,
    angle2winddir,
    feet2m,
    winddir2angle,
)
from dump1090_postgis_spark.operators.copy import remap_ids
from dump1090_postgis_spark.operators.retention import (
    positions_live,
    retention_delete_plan,
)
from dump1090_postgis_spark.sources.dims import (
    airports_from_csv,
    load_aircraft_images,
    load_airlines_csv,
    load_airports_csv,
    load_runways_csv,
    runways_from_csv,
)

D = datetime.datetime
HERE = os.path.dirname(__file__)
RUNWAYS_CSV = os.path.join(HERE, "fixtures", "runways_sample.csv")
AIRPORTS_CSV = os.path.join(HERE, "fixtures", "airports_sample.csv")


def test_load_airlines_csv(spark, tmp_path):
    p = tmp_path / "airlines.csv"
    p.write_text(
        'id,name,alias,iata,icao,callsign,country,active\n'
        '1,"Air France",,AF,AFR,AIRFRANS,France,Y\n'
        '2,"Lufthansa",,LH,DLH,LUFTHANSA,Germany,Y\n'
    )
    out = load_airlines_csv(spark, str(p)).collect()
    assert len(out) == 2
    assert out[0].icao == "AFR" and out[0].country == "France"
    assert out[0].id == 1  # declared schema, no inference


def _tiny_bmp() -> bytes:
    # minimal BMP header (14 bytes) + fake pixel data — enough for the
    # binaryFile scan; content is opaque to the loader
    return b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + b"\x00" * 12


def test_load_aircraft_images(spark, tmp_path):
    (tmp_path / "A320.bmp").write_bytes(_tiny_bmp())
    (tmp_path / "B738.bmp").write_bytes(_tiny_bmp())
    (tmp_path / "notes.txt").write_text("ignored")  # glob excludes
    out = load_aircraft_images(spark, str(tmp_path)).collect()
    models = sorted(r.model for r in out)
    assert models == ["A320", "B738"]
    assert all(r.image_bytes == 26 for r in out)
    assert all(bytes(r.image[:2]) == b"BM" for r in out)


def test_runways_from_csv_lfrs(spark):
    """The generic loader reproduces the hand-coded NTE seed from the
    reference's own runways.csv row: two designators sharing a derived
    strip polygon whose corners land on the surveyed quadrilateral
    (airports.py:129-153) within ~100 m."""
    out = runways_from_csv(load_runways_csv(spark, RUNWAYS_CSV), "LFRS").collect()
    assert sorted(r.name for r in out) == ["03", "21"]
    by_name = {r.name: r for r in out}
    assert by_name["03"].direction == 28 and by_name["21"].direction == 208
    assert by_name["03"].length == pytest.approx(9514 * 0.3048, abs=0.1)
    # derived polygon ≈ the reference's hand-drawn strip corners
    # the hand polygon stops ~190 m short of the surveyed 21-end
    # threshold, so corner agreement is ~1e-5 deg at the 03 end and
    # ~2e-3 at the 21 end
    hand = [(-1.619792, 47.141703), (-1.603446, 47.163170),
            (-1.602936, 47.162999), (-1.619280, 47.141525)]
    derived = [(p.lon, p.lat) for p in by_name["03"].polygon]
    for (hx, hy) in hand:
        assert any(abs(hx - dx) < 2.5e-3 and abs(hy - dy) < 2.5e-3
                   for (dx, dy) in derived)
    # both designators share one strip
    assert derived == [(p.lon, p.lat) for p in by_name["21"].polygon]


def test_runways_from_csv_filters(spark):
    """Helipads without coordinates, coordinate-less strips, and
    closed runways are dropped; missing surveyed headings fall back to
    designator × 10."""
    out = runways_from_csv(load_runways_csv(spark, RUNWAYS_CSV)).collect()
    idents = {r.airport_icao for r in out}
    assert "00A" not in idents and "00AL" not in idents  # no coords
    assert "XCLS" not in idents                          # closed=1
    noh = {r.name: r.direction for r in out if r.airport_icao == "XNOH"}
    assert noh == {"06": 60, "24": 240}


def test_runways_from_csv_drives_attribution(spark):
    """attribute_runway consumes the generic loader's output directly:
    an event inside the LFRS strip heading ~28° attributes to '03'."""
    from dump1090_postgis_spark.operators.attribution import attribute_runway

    runways = runways_from_csv(load_runways_csv(spark, RUNWAYS_CSV), "LFRS")
    # dead-center of the strip (midpoint of the two thresholds) — the
    # derived polygon is only a half-width (~22.6 m) wide
    ev = spark.createDataFrame(
        [(1, -1.61072, 47.1532, 29.0),   # mid-strip, runway-03 heading
         (2, -1.61072, 47.1532, 209.0),  # same point, reciprocal heading
         (3, -1.6500, 47.2000, 29.0)],   # off-airport
        "event_id long, longitude double, latitude double, interp_track double",
    )
    out = {r.event_id: r.runway for r in attribute_runway(ev, runways).collect()}
    assert out[1] == "03" and out[2] == "21" and out[3] == "UNK"


def test_airports_from_csv_bbox_envelope(spark):
    runways = runways_from_csv(load_runways_csv(spark, RUNWAYS_CSV))
    out = airports_from_csv(
        load_airports_csv(spark, AIRPORTS_CSV), runways
    ).collect()
    by_icao = {r.icao: r for r in out}
    lfrs = by_icao["LFRS"]
    assert lfrs.iata == "NTE" and lfrs.city == "Nantes"
    assert lfrs.altitude == pytest.approx(90 * 0.3048, abs=0.01)
    # envelope covers every runway corner with margin
    lons = [p.lon for p in lfrs.bbox]
    lats = [p.lat for p in lfrs.bbox]
    for r in runways.filter("airport_icao = 'LFRS'").collect():
        for p in r.polygon:
            assert min(lons) < p.lon < max(lons)
            assert min(lats) < p.lat < max(lats)
    # no runways in fixture → NULL bbox, row still present
    assert by_icao["XNOH"].bbox is not None  # XNOH has runways
    no_rw = airports_from_csv(load_airports_csv(spark, AIRPORTS_CSV)).collect()
    assert all(r.bbox is None for r in no_rw)


def test_positions_live_and_retention_complement(spark):
    now = D(2024, 5, 2, 12, 0)
    df = spark.createDataFrame(
        [
            (1, D(2024, 5, 2, 11, 0)),   # within 24 h
            (2, D(2024, 5, 1, 12, 0)),   # exactly 24 h → kept (>=)
            (3, D(2024, 5, 1, 11, 59)),  # older → deleted
        ],
        "id long, time timestamp",
    )
    live = {r.id for r in positions_live(df, now=now).collect()}
    dead = {r.id for r in retention_delete_plan(df, now=now).collect()}
    assert live == {1, 2} and dead == {3}
    assert live | dead == {1, 2, 3} and not (live & dead)


def test_remap_ids_fk_consistency(spark):
    flights = spark.createDataFrame(
        [(5, "AAA"), (9, "BBB"), (12, "CCC")], "id long, hexident string"
    )
    positions = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 12), (4, 9)], "pid long, flight_id long"
    )
    new_flights, children = remap_ids(
        flights, {"positions": positions}, flight_ids=[5, 12], id_offset=1000
    )
    nf = {r.hexident: r.id for r in new_flights.collect()}
    assert nf == {"AAA": 1001, "CCC": 1002}  # dense, ordered by old id
    np_ = sorted((r.pid, r.flight_id) for r in children["positions"].collect())
    assert np_ == [(1, 1001), (2, 1001), (3, 1002)]  # fk follows; BBB's dropped


@pytest.mark.parametrize(
    "fn,inp,expected",
    [
        (feet2m, 1000.0, 304.8),
        (angle2compass, 90.0, 0.0),    # east (math) → north? no: (450-90)%360=0
        (angle2compass, 0.0, 90.0),    # math 0° (east) → compass 90°
        (winddir2angle, 270.0, 0.0),
        (angle2winddir, 0.0, 270.0),
    ],
)
def test_conversions(spark, fn, inp, expected):
    out = spark.range(1).select(fn(F.lit(inp)).alias("v")).collect()[0].v
    assert out == pytest.approx(expected)


FULL_RUNWAYS_CSV = "/root/reference/database/data/runways.csv"


@pytest.mark.skipif(
    not os.path.exists(FULL_RUNWAYS_CSV), reason="reference CSV not present"
)
def test_attribution_scales_to_full_runways_csv(spark):
    """The real 42,476-row ourairports runways.csv must route through
    the grid-cell broadcast join, NOT the compiled coalesce (a ~10^5
    branch expression tree would choke Catalyst analysis).  The plan
    must broadcast-hash-join on the grid cell, and the LFRS mid-strip
    probes must attribute exactly as the sample-fixture test does."""
    from dump1090_postgis_spark.operators.attribution import attribute_runway

    runways = runways_from_csv(load_runways_csv(spark, FULL_RUNWAYS_CSV))
    ev = spark.createDataFrame(
        [(1, -1.61072, 47.1532, 29.0),   # LFRS mid-strip, runway-03 heading
         (2, -1.61072, 47.1532, 209.0),  # reciprocal
         (3, -1.6500, 47.2000, 29.0)],   # off-airport
        "event_id long, longitude double, latitude double, interp_track double",
    )
    out_df = attribute_runway(ev, runways)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no compiled-coalesce blowup: the giant first-match CASE chain
    # would show once per runway (~42k CASEs here); the join path's
    # unrolled first-match is a CONSTANT ~120 (CELL_SCAN_UNROLL
    # candidates × PIP_UNROLL_EDGES edge guards), independent of the
    # dim size — the budget below is well under one CASE per runway.
    assert plan.count("CASE WHEN") < 500
    out = {r.event_id: r.runway for r in out_df.collect()}
    assert out[1] == "03" and out[2] == "21" and out[3] == "UNK"


def test_read_documents_jsonl_quarantines_malformed(spark, tmp_path):
    """SRC discipline on the JSONL corpus reader: good rows parse from
    one scan, malformed/incomplete records land in quarantine as raw
    lines, nothing vanishes."""
    from dump1090_postgis_spark.sources.corpus import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}\n'
        'not json at all\n'
        '{"doc_id": "notanint", "text": "x"}\n'
        '{"doc_id": 3}\n'  # missing required text
        '\n'       # blank line: skipped, NOT quarantined (json-reader
        '   \n'    # parity — trailing newlines are not evidence)
    )
    good, bad = read_documents_jsonl(spark, str(p))
    g = {r.doc_id: r.text for r in good.collect()}
    assert g == {1: "hello world", 2: "bonjour"}
    b = [r.raw for r in bad.collect()]
    assert len(b) == 3 and any("not json" in x for x in b)

    # round-trip: export good rows sharded, re-read, same content
    out = str(tmp_path / "export")
    write_documents_jsonl(good, out, shards=2)
    again, none = read_documents_jsonl(spark, out)
    assert {r.doc_id: r.text for r in again.collect()} == g
    assert none.count() == 0


def test_quarantine_preserves_raw_line_for_valid_json(spark, tmp_path):
    """A record that PARSES but misses a required field must land in
    quarantine as its ORIGINAL line — the old to_json reconstruction
    dropped null fields and unknown keys, making the evidence
    unrecoverable (SRC-3 keep-the-evidence rule)."""
    from dump1090_postgis_spark.sources.corpus import read_documents_jsonl

    line = '{"doc_id": null, "text": "x", "extra_key": 1}'
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good", "lang": "en", "source": "s"}\n'
        + line + "\n"
        + "not json at all\n"
    )
    good, bad = read_documents_jsonl(spark, str(p))
    assert good.count() == 1
    raws = {r.raw for r in bad.collect()}
    assert line in raws          # byte-for-byte original, extra key intact
    assert "not json at all" in raws


def test_airports_without_runways_have_null_bbox(spark):
    """An airport with NO matching runway rows must get a truly NULL
    bbox, not a 4-vertex array of NULL coordinates (bbox.isNotNull()
    is the boundary contract)."""
    from dump1090_postgis_spark.sources.dims import (
        airports_from_csv,
        load_airports_csv,
        load_runways_csv,
        runways_from_csv,
    )

    air = load_airports_csv(spark, AIRPORTS_CSV)
    rwy = runways_from_csv(load_runways_csv(spark, RUNWAYS_CSV), "LFRS")
    out = {r.icao: r for r in airports_from_csv(air, runways=rwy).collect()}
    assert out["LFRS"].bbox is not None
    # every airport in the fixture whose icao has no runway polygon
    # must be truly NULL, not an array of NULL-coordinate vertices
    no_rwy = [r for icao, r in out.items() if icao != "LFRS"]
    assert no_rwy and all(r.bbox is None for r in no_rwy)


def test_load_table_ts_range_tz_aware_and_boundary_exact(spark):
    """ts_range accepts tz-aware bounds (docstring contract), converts
    fractional-microsecond bounds exactly (float total_seconds lost
    1 µs on ~1.2% of values), and REFUSES a range it cannot apply."""
    import datetime as dt

    import pytest

    from dump1090_postgis_spark.schemas import load_table

    lo = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    hi = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
    aware = load_table(
        spark, "/root/testdata/sf0.001", "events", ts_range=(lo, hi)
    )
    naive = load_table(
        spark, "/root/testdata/sf0.001", "events",
        ts_range=("2024-01-01", "2024-01-02"),
    )
    assert aware.count() == naive.count() > 0

    with pytest.raises(ValueError, match="ts_range"):
        load_table(
            spark, "/root/testdata/sf0.001", "customer",
            ts_range=("2024-01-01", "2024-01-02"),
        )


def test_load_table_offset_string_bounds_agree_across_layouts(spark, tmp_path):
    """An ISO-string bound carrying a non-UTC offset must prune the
    SAME range on the native-timestamp layout as on the bigint-nanos
    layout (the native branch used to cast by wall-clock fields,
    ignoring the offset — round-10 advisor)."""
    from dump1090_postgis_spark.schemas import load_table

    # rewrite the real events table in the native timestamp layout
    native_dir = str(tmp_path)
    load_table(spark, "/root/testdata/sf0.001", "events").write.parquet(
        f"{native_dir}/events.parquet"
    )
    off = ("2024-01-01T06:00:00+02:00", "2024-01-01T18:00:00+02:00")
    utc = ("2024-01-01T04:00:00", "2024-01-01T16:00:00")
    n_bigint_off = load_table(
        spark, "/root/testdata/sf0.001", "events", ts_range=off
    ).count()
    n_native_off = load_table(
        spark, native_dir, "events", ts_range=off
    ).count()
    n_native_utc = load_table(
        spark, native_dir, "events", ts_range=utc
    ).count()
    assert n_bigint_off == n_native_off == n_native_utc > 0
