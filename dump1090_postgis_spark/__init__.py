"""dump1090_postgis_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Xenotech81/dump1090-postgis.

The reference system (see /root/reference) is a single-process Python
ETL that parses an SBS-1 ADS-B message stream, sessionizes it into
flights, detects landings/takeoffs geometrically, and serves a SQL
query API out of Postgres/PostGIS.  This package re-expresses every
one of those capabilities Spark-first:

- ``sources``    — SBS-1 socket/file/text sources, CSV dimension and
                   binary (image) loaders (SURVEY §2.1 SRC-1..5).
- ``operators``  — parse/normalize, filters, sessionization, edge
                   detection, debounce, histogram, peak-hour,
                   trajectory, star-join details, dedup, attribution
                   (SURVEY §2.2-2.8).
- ``functions``  — scalar helpers: unit conversion, compass math,
                   timezone binning, point-in-polygon, GeoJSON.
- ``plans``      — the user-facing parameterized query API mirroring
                   the reference's SQL functions (landings_on,
                   events_histogram, peak_hour_all, flight_path, ...).
- ``streaming``  — Structured Streaming wrap: socket → parse →
                   applyInPandasWithState sessionizer → sinks.
- ``datapipe``   — large-scale training-data pipeline extensions:
                   dedup (exact/minhash/simhash/embedding), similarity
                   search, text analysis, multimodal binary columns.

Everything is built on the public PySpark DataFrame/SQL API; no RDDs,
no custom Catalyst extensions.  Python UDFs appear only where the
built-in operators genuinely cannot express the semantics (per-group
stateful debounce in streaming, multimodal decode stubs) and are
always Arrow-vectorized.
"""

__version__ = "0.1.0"
