"""User-facing query plans.

- ``testdata_queries`` — the SURVEY §2 operator surface expressed over
  the driver's testdata tables, each with a DuckDB oracle.
- ``datapipe_queries`` — the training-data pipeline extensions
  (dedup, similarity, text analysis, multimodal) over
  documents/embeddings.
- ``adsb`` — the reference's actual query API (landings_on,
  events_histogram, flight_path, ...) over flights/positions/events
  tables produced by the engine's own pipeline.
"""

from __future__ import annotations


def full_registry():
    """name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql|None)."""
    from . import datapipe_queries, meta_queries, testdata_queries

    reg: dict = {}
    reg.update(testdata_queries.REGISTRY)
    reg.update(datapipe_queries.REGISTRY)
    reg.update(meta_queries.REGISTRY)
    return reg
