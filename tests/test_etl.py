"""End-to-end batch ETL: a multi-aircraft synthetic capture through
build_tables, then the reference query API over the produced tables."""

import datetime

import pytest
from pyspark.sql import functions as F

from dump1090_postgis_spark.plans import adsb
from dump1090_postgis_spark.plans.etl import build_tables
from dump1090_postgis_spark.sources.dims import nte_airport, nte_runways

# Aircraft 1 (AAA111): MSG1 callsign, descent onto the NTE strip
# heading ~32°, onground flip → landing on runway 03.
# Aircraft 2 (BBB222): first message is MSG1 (not admissible — dropped,
# reference CASE B retries per message) but its MSG3 at 8000 ft IS
# admitted → flight starts there, without the pre-admission callsign.
# Aircraft 3 (CCC333): only message is MSG3 at 35000 ft — fails the
# admission-time altitude filter → never becomes a flight.
CAPTURE = [
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:00.000,2024/05/01,10:00:00.000,,900,,,47.1417,-1.6198,,,0,,0,0",
    "MSG,1,1,1,AAA111,1,2024/05/01,10:00:01.000,2024/05/01,10:00:01.000,AFR123 ,,,,,,,,0,,0,0",
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:05.000,2024/05/01,10:00:05.000,,300,,,47.1460,-1.6162,,,0,,0,0",
    "MSG,3,1,1,AAA111,1,2024/05/01,10:00:10.000,2024/05/01,10:00:10.000,,50,,,47.1523,-1.6114,,,0,,0,-1",
    "MSG,1,1,1,BBB222,1,2024/05/01,10:00:02.000,2024/05/01,10:00:02.000,DLH456 ,,,,,,,,0,,0,0",
    "MSG,3,1,1,BBB222,1,2024/05/01,10:00:04.000,2024/05/01,10:00:04.000,,8000,,,47.5000,-1.2000,,,0,,0,0",
    "MSG,3,1,1,CCC333,1,2024/05/01,10:00:03.000,2024/05/01,10:00:03.000,,35000,,,48.0000,-1.0000,,,0,,0,0",
    "not,a,valid,line",
]


@pytest.fixture(scope="module")
def tables(spark):
    raw = spark.createDataFrame([(l,) for l in CAPTURE], "value string")
    return build_tables(raw, nte_runways(spark), nte_airport(spark))


def test_flights_admission_and_filter(tables):
    flights = {r.hexident: r for r in tables["flights"].collect()}
    assert "AAA111" in flights           # admitted (first msg = MSG3 @900ft)
    assert "CCC333" not in flights       # 35000 ft fails admission filter
    f = flights["AAA111"]
    assert f.callsign == "AFR123"
    assert f.intention == "arrival"      # ends onground (STATE-9)
    assert f.n_messages == 4
    # BBB222: MSG1 dropped pre-admission, MSG3 admitted → flight exists
    # starting at the MSG3, with no callsign (reference CASE B retry)
    b = flights["BBB222"]
    assert b.callsign is None
    assert b.first_seen.isoformat() == "2024-05-01T10:00:04"
    assert b.n_messages == 1


def test_positions_table(tables):
    pos = tables["positions"].orderBy("time").collect()
    # AAA111 (id 1) three MSG3s + BBB222 (id 2) one admitted MSG3
    assert [p.flight_id for p in pos] == [1, 2, 1, 1]
    assert pos[0].altitude_m == pytest.approx(900 * 0.3048)
    assert pos[-1].onground is True
    assert [p.id for p in pos] == [1, 2, 3, 4]       # dense deterministic ids


def test_landing_attributed_to_runway_03(tables):
    landings = tables["landings"].collect()
    assert len(landings) == 1
    assert landings[0].runway == "03"
    assert landings[0].time == datetime.datetime(2024, 5, 1, 10, 0, 10)
    assert tables["takeoffs"].count() == 0


def test_query_api_over_built_tables(tables, spark):
    # the reference's user path: landings_on + histogram + flight_path
    out = adsb.landings_on(tables["landings"], datetime.date(2024, 5, 1)).collect()
    assert len(out) == 1
    hist = adsb.landings_histogram(
        tables["landings"],
        datetime.datetime(2024, 5, 1, 9, 0),
        datetime.datetime(2024, 5, 1, 12, 0),
        "hour",
        tz=None,
    ).collect()
    assert [r.events for r in hist] == [0, 1, 0, 0]
    paths = adsb.flight_path(tables["positions"]).collect()
    assert len(paths) == 2 and all(p.wkt.startswith("LINESTRING") for p in paths)


def test_rerun_is_deterministic(spark, tables):
    raw = spark.createDataFrame([(l,) for l in CAPTURE], "value string")
    again = build_tables(raw, nte_runways(spark), nte_airport(spark))
    a = sorted(map(tuple, tables["positions"].collect()))
    b = sorted(map(tuple, again["positions"].collect()))
    assert a == b


def test_output_path_mode_releases_all_caches(spark, tmp_path):
    """build_tables(output_path=...) writes all four tables and
    unpersists every internal layout pin — nothing stays cached
    (VERDICT r1: lingering DISK/MEMORY pins compete with shuffle
    memory at scale)."""
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    raw = spark.createDataFrame([(l,) for l in CAPTURE], "value string")
    out = build_tables(
        raw, nte_runways(spark), nte_airport(spark),
        output_path=str(tmp_path / "etl_out"),
    )
    assert out["flights"].count() == 2
    assert out["positions"].count() == 4
    # no NEW pins survive the call (the module fixture's legacy-lazy
    # build may hold its own)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline
    # read-back tables are plain parquet scans — re-collect is stable
    assert sorted(r.id for r in out["positions"].collect()) == [1, 2, 3, 4]


def test_caches_registry_mode(spark):
    """Lazy mode with a caller-held registry: pins accumulate during
    the build, release_caches() drops them all."""
    from dump1090_postgis_spark.operators.ids import release_caches

    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    raw = spark.createDataFrame([(l,) for l in CAPTURE], "value string")
    caches = []
    t = build_tables(raw, nte_runways(spark), nte_airport(spark), caches=caches)
    t["flights"].count()
    t["positions"].count()
    t["landings"].count()
    t["takeoffs"].count()
    assert len(caches) >= 4  # sess + per-table id pins
    release_caches(caches)
    assert caches == []
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline


def test_output_path_partition_pruning(spark, tmp_path):
    """Engine-written time tables are DATE-PARTITIONED (the Spark
    analog of create_public_schema.sql:759-811's time indexes +
    CLUSTER): FLT-5/6 over the engine's own output must prune
    PARTITIONS (PartitionFilters on _dt in the scan), not just push
    row-group filters — the first lever a 100 TB user reaches for."""
    import re

    raw = spark.createDataFrame([(l,) for l in CAPTURE], "value string")
    out = build_tables(
        raw, nte_runways(spark), nte_airport(spark),
        output_path=str(tmp_path / "etl_part"),
    )
    for name in ("positions", "landings", "takeoffs"):
        assert "_dt" in out[name].columns

    day = datetime.date(2024, 5, 1)
    plan = (
        adsb.landings_on(out["landings"], day)
        ._jdf.queryExecution().executedPlan().toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "_dt" in m.group(1), plan
    # rows still correct through the partitioned layout
    assert adsb.landings_on(out["landings"], day).count() == 1
    assert adsb.landings_on(out["landings"], datetime.date(2024, 5, 2)).count() == 0

    # FLT-6 local-date range prunes too (±1-day UTC bracket)
    plan6 = (
        adsb.landings_fromto(out["landings"], day, datetime.date(2024, 5, 2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    m6 = re.search(r"PartitionFilters: \[([^\]]*)\]", plan6)
    assert m6 and "_dt" in m6.group(1), plan6
    assert adsb.landings_fromto(
        out["landings"], day, datetime.date(2024, 5, 2)
    ).count() == 1
