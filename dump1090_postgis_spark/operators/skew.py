"""Skew-aware aggregation: two-stage salted groupBy.

A groupBy on a heavily skewed key (a handful of hot values holding
most rows) funnels each hot key through ONE reducer task — the
classic straggler at 100 TB.  Spark's map-side partial aggregation
already absorbs most of this for algebraic aggregates, but when the
per-key partial state is large (collect_list/collect_set, big
distinct maps) or AQE skew handling is unavailable (it only splits
JOIN partitions, not aggregations), explicit salting is the fix:

stage 1: groupBy(key, salt = pmod(hash-ish, n_salts)) — partials
         spread across n_salts reducers per key;
stage 2: groupBy(key) merging the partials — n_salts rows per key,
         trivially small.

Only MERGEABLE aggregates are offered (count/sum/min/max + their
combinations like avg = sum/count) — a non-decomposable aggregate
cannot be salted without changing semantics.

Reference analog: none (single-node Postgres has no stragglers);
this is a scale extension per the engine's 100 TB brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_counts(
    df: DataFrame,
    key: str | list[str],
    n_salts: int = DEFAULT_SALTS,
    salt_source: Column | None = None,
) -> DataFrame:
    """COUNT(*) per key via two salted stages.

    ``salt_source`` defaults to a deterministic xxhash64 over every
    input column (see salted_aggregate); pass any integer column
    expression to override.
    """
    return salted_aggregate(
        df, key, counts=[("rows", None)], n_salts=n_salts,
        salt_source=salt_source,
    )


def salted_aggregate(
    df: DataFrame,
    key: str | list[str],
    counts: list[tuple[str, str | None]] = (),
    sums: list[tuple[str, str]] = (),
    mins: list[tuple[str, str]] = (),
    maxs: list[tuple[str, str]] = (),
    n_salts: int = DEFAULT_SALTS,
    salt_source: Column | None = None,
) -> DataFrame:
    """Mergeable aggregates per key via two salted stages.

    Each spec is ``(out_name, in_col)``; for counts ``in_col=None``
    means COUNT(*) else COUNT(col) (non-null).  Results are identical
    to the direct single-stage groupBy (asserted in tests) — only the
    shuffle distribution changes: stage 1 spreads each hot key over
    ``n_salts`` reducers, stage 2 merges ``n_salts`` partials per key.

    The default salt is xxhash64 over EVERY input column — fully
    deterministic per row content.  A nondeterministic salt
    (monotonically_increasing_id / rand / spark_partition_id) is a
    correctness hazard used as a grouping key: when a task retries
    after a partial shuffle fetch, recomputed map tasks re-salt rows
    differently and partials are double-counted or dropped.  Identical
    rows sharing a salt is fine — the salt only needs to spread a hot
    KEY's rows, and hot keys with varied payloads spread by payload
    hash; a pathological corpus of byte-identical rows still lands on
    one salt, in which case pass an explicit ``salt_source`` (e.g. a
    unique id column's hash).
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt = (
        salt_source if salt_source is not None
        else F.xxhash64(*[F.col(c) for c in df.columns])
    )
    salted = df.withColumn("_salt", F.pmod(salt, F.lit(n_salts)))

    stage1 = []
    stage2 = []
    for out, col in counts:
        stage1.append(
            (F.count(F.lit(1)) if col is None else F.count(col)).alias(f"_c_{out}")
        )
        stage2.append(F.sum(f"_c_{out}").alias(out))
    for out, col in sums:
        stage1.append(F.sum(col).alias(f"_s_{out}"))
        stage2.append(F.sum(f"_s_{out}").alias(out))
    for out, col in mins:
        stage1.append(F.min(col).alias(f"_mn_{out}"))
        stage2.append(F.min(f"_mn_{out}").alias(out))
    for out, col in maxs:
        stage1.append(F.max(col).alias(f"_mx_{out}"))
        stage2.append(F.max(f"_mx_{out}").alias(out))
    if not stage1:
        raise ValueError("no aggregates requested")

    partials = salted.groupBy(*keys, "_salt").agg(*stage1)
    return partials.groupBy(*keys).agg(*stage2)
