"""Cross-catalog flight copy with FK remap (SURVEY §2.1 SNK-5;
reference create_public_schema.sql:149-172 `d1090_copy_flight`).

The reference plpgsql proc copies one flight + its child rows from a
`dev` schema into `public`, assigning a fresh id and remapping the
children's FK.  Spark-first: compute an id-mapping DataFrame and
broadcast-join it onto each child table — set-oriented (any number of
flights in one pass), no per-row loop.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def remap_ids(
    flights: DataFrame,
    children: dict[str, DataFrame],
    flight_ids: Sequence[int],
    id_offset: int,
    key: str = "id",
    fk: str = "flight_id",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Copy `flight_ids` out of `flights` with new ids starting at
    `id_offset`+1 (dense), remapping each child table's FK.

    Returns (new_flights, {name: new_child}).  The mapping is tiny →
    broadcast; children shuffle zero times.

    The unpartitioned row_number window runs only over the explicitly
    selected flights (`flight_ids` is a caller-supplied list, the same
    contract under which the mapping is broadcast) — bounded by
    construction, never corpus-sized.  For dense ids over an unbounded
    frame use ``operators.ids.with_dense_ids`` instead.
    """
    selected = flights.filter(F.col(key).isin(list(flight_ids)))
    mapping = selected.select(
        F.col(key).alias("_old_id"),
        (F.row_number().over(Window.orderBy(key)) + F.lit(id_offset)).alias(
            "_new_id"
        ),
    )
    new_flights = (
        selected.join(F.broadcast(mapping), selected[key] == mapping["_old_id"])
        .drop(key, "_old_id")
        .withColumnRenamed("_new_id", key)
    )
    new_children = {}
    for name, child in children.items():
        new_children[name] = (
            child.join(F.broadcast(mapping), child[fk] == mapping["_old_id"], "inner")
            .drop(fk, "_old_id")
            .withColumnRenamed("_new_id", fk)
        )
    return new_flights, new_children
