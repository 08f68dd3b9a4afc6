"""Dataset splitting and capped sampling for training-data curation.

- :func:`hash_split` — deterministic train/val/test assignment from a
  content-independent hash of the id.  Pure projection (scan-speed at
  100 TB, no shuffle, reproducible across runs/engines): the bucket is
  the first 8 hex chars of md5(id) read as an integer, so any engine
  with md5 derives the identical split (the DuckDB oracle does).
- :func:`top_n_per_key` — "at most N docs per domain/language, best
  first": the per-group cap every curation recipe needs.  The naive
  row_number window shuffles EVERY row of a group into one task — a
  corpus that is 80% English puts 80% of the data in one partition.
  The two-phase form bounds that: a salted pre-pass takes the local
  top-N within each (key, salt) slice (salt from a hash of the id —
  deterministic, retry-safe), cutting each group to at most
  N·n_salts rows before the global window runs.  Correct because the
  global top-N is a subset of every covering slice-partition's local
  top-N union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h32(c: Column) -> Column:
    """First 32 bits of md5(c) as a bigint — the ONE engine-portable
    hash core (md5 + hex arithmetic only; the DuckDB oracle restates
    it bit-for-bit).  Shared by :func:`hash_bucket` and
    ``packing.uniform_hash`` so the portability contract lives in one
    expression that cannot drift."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): first 32 hash bits of
    md5(id as string), mod buckets.  Engine-portable (md5 + hex
    arithmetic only)."""
    return F.pmod(_h32(id_col.cast("string")), F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    out: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket (train_pct/val_pct/rest).
    Adding data never reshuffles existing assignments — the property
    that makes hash splits the curation default over random splits."""
    b = hash_bucket(F.col(id_col))
    return df.withColumn(
        out,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def top_n_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    n: int,
    id_col: str = "doc_id",
    n_salts: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-``n`` rows per key group under ``order_cols``
    (which must be a deterministic total order — break ties on the id).

    ``n_salts`` enables the skew-bounded two-phase plan: local top-n
    per (keys, salt) first (salt = hash(id) mod n_salts, deterministic
    on retry), global top-n over the survivors after.  At most
    n·n_salts rows per group cross the second shuffle regardless of
    group skew."""
    if n_salts:
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
        pre = Window.partitionBy(*keys, salt).orderBy(*order_cols)
        df = (
            df.withColumn("_pre_rank", F.row_number().over(pre))
            .filter(F.col("_pre_rank") <= n)
            .drop("_pre_rank")
        )
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def rank_quantile_threshold(
    df: DataFrame,
    value: str,
    q: float,
    keys: list[str],
) -> DataFrame:
    """Per-group exact q-quantile threshold (nearest-rank: smallest v
    with |{x <= v}| >= ceil(q*n)) — computed SCALABLY for
    bounded-cardinality scores.

    ``percentile()`` buffers every group value in one agg buffer —
    O(group size) memory, a non-starter when one language is 80% of a
    100 TB corpus.  Rounded scores (quality is 4-dp in [0,1]) have at
    most ~10^4 distinct values, so the histogram route is exact AND
    mergeable: groupBy (keys, value) count (partial agg — the only
    corpus-sized shuffle emits one row per distinct (key, value)),
    then a cumulative sum over the tiny per-key histogram, then the
    rank pick.  Window partitions are histogram-sized, never
    corpus-sized.
    """
    from pyspark.sql import Window

    hist = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    # round before ceil: the double product q·n can land an ulp above
    # an integral value (0.07 × 100 = 7.000000000000001) and ceil then
    # overshoots the documented exact rank by one; 9 decimals is far
    # beyond any realistic group count while leaving true fractions
    # untouched.  The DuckDB oracle SQL applies the same round.
    return (
        cum.filter(
            F.col("_cum") >= F.ceil(F.round(F.lit(q) * F.col("_n"), 9))
        )
        .groupBy(*keys)
        .agg(F.min(value).alias("threshold"))
    )


def quantile_filter(
    df: DataFrame,
    value: str,
    q: float = 0.5,
    keys: list[str] | None = None,
) -> DataFrame:
    """Keep rows at or above their group's q-quantile of ``value`` —
    the adaptive version of a fixed quality cutoff (each language/
    domain keeps its best (1-q) fraction instead of sharing one global
    threshold that starves low-scoring languages).  Thresholds are one
    row per group → broadcast join back; the corpus is scanned twice
    (once to build the histogram, once to filter) — persist the scored
    frame between passes if the scoring projection is expensive.
    """
    keys = keys or []
    thr = rank_quantile_threshold(df, value, q, keys)
    if keys:
        # null-safe key join (same discipline as stratified_exact_split):
        # a NULL group key is a real group — the histogram computed its
        # threshold — and a plain equi-join would silently remove every
        # NULL-key row wholesale instead of gating it against its own
        # group's quantile.
        thr = thr.select(
            *[F.col(s).alias(f"_th_{s}") for s in keys], "threshold"
        )
        cond = None
        for s in keys:
            c = F.col(s).eqNullSafe(F.col(f"_th_{s}"))
            cond = c if cond is None else (cond & c)
        joined = df.join(F.broadcast(thr), cond).drop(
            *[f"_th_{s}" for s in keys]
        )
    else:
        joined = df.crossJoin(F.broadcast(thr))
    return joined.filter(F.col(value) >= F.col("threshold"))


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "42",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Seeded, reproducible global shuffle for training order:
    ``(id, pos, shard)`` where ``pos`` is the row's 0-based position in
    the order of ``md5(seed|id)`` (id tiebreak) and ``shard`` deals
    positions round-robin across ``n_shards``.

    Why not ``ORDER BY rand()``: training-data shuffles must be
    reproducible across retries, engines, and incremental reruns — a
    seeded content-independent hash gives the same permutation every
    time, and changing the seed is a fresh epoch-level reshuffle.

    Scale shape: position assignment is ``with_dense_ids`` (range
    partition by the hash + per-partition numbering + driver-side
    offsets of per-partition COUNTS), never a single-partition
    row_number window; round-robin sharding then needs no second
    shuffle — a shard's rows are scattered across the hash range, so
    downstream per-shard readers see an unbiased sample of the corpus.
    """
    from ..operators.ids import with_dense_ids

    h = F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    staged = df.select(F.col(id_col), h.alias("_h"))
    # Pass the caller's cache registry through: with_dense_ids pins a
    # DISK_ONLY layout frame that must be release_caches()'d once the
    # shuffled output is materialized — per-epoch reshuffles would
    # otherwise each pin another copy of the (id, hash) projection.
    numbered = with_dense_ids(staged, ["_h", id_col], id_col="_pos1", caches=caches)
    return numbered.select(
        id_col,
        (F.col("_pos1") - 1).cast("bigint").alias("pos"),
        F.pmod(F.col("_pos1") - 1, F.lit(n_shards)).cast("bigint").alias("shard"),
    )


def percentile_normalize(
    df: DataFrame,
    value: str,
    keys: list[str] | None = None,
    out: str = "pct",
) -> DataFrame:
    """Per-group percentile (cume_dist) normalization of ``value`` —
    quality-score CALIBRATION across heterogeneous groups: a raw
    score of 0.6 can be élite in one source and mediocre in another,
    so mixture decisions should compare ranks, not raw scores.
    Adds ``out`` = fraction of the row's group with value ≤ this
    row's value (cume_dist semantics, exactly).

    Same scale argument as :func:`rank_quantile_threshold`: a
    ``cume_dist().over(partitionBy(keys))`` window buffers whole
    groups (O(group) — fatal when one source is most of the corpus).
    Bounded-cardinality values (rounded scores) make the histogram
    route exact and mergeable: ONE corpus-sized partial-agg shuffle
    to (keys, value) counts, a cumulative sum over the per-key
    histogram (window partitions are histogram-sized), then a
    broadcast join back to the rows.
    """
    from pyspark.sql import Window

    keys = keys or []
    hist = df.groupBy(*keys, value).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*keys) if keys else Window.partitionBy()
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(wn)
    )
    # null-safe join back on (keys, value): NULL group keys and NULL
    # values are real histogram rows (groupBy keeps them, and the
    # DuckDB-oracle cume_dist keeps them), so a plain equi-join would
    # silently drop every such row from the calibrated output.
    pct_tbl = cum.select(
        *[F.col(s).alias(f"_pn_{s}") for s in [*keys, value]],
        F.round(F.col("_cum").cast("double") / F.col("_n"), 6).alias(out),
    )
    cond = None
    for s in [*keys, value]:
        c = F.col(s).eqNullSafe(F.col(f"_pn_{s}"))
        cond = c if cond is None else (cond & c)
    return df.join(F.broadcast(pct_tbl), cond).drop(
        *[f"_pn_{s}" for s in [*keys, value]]
    )


def sample_exact_n(
    df: DataFrame, n: int, id_col: str = "doc_id", seed: str = "42"
) -> DataFrame:
    """Deterministic EXACT-n corpus sample: the n rows with the
    smallest md5(seed|id) — a seeded uniform draw that is reproducible
    across runs, engines, and cluster sizes, and re-seedable for
    disjoint repeated draws (unlike df.sample, whose output depends on
    partitioning and returns only an approximate fraction).

    Plan shape: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps its local top-n (a bounded heap), the driver
    merges partition heads; no global sort, no full shuffle.
    """
    h = F.md5(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))
    return (
        df.withColumn("_h", h)
        .orderBy("_h", id_col)
        .limit(n)
        .drop("_h")
    )


def stratified_exact_split(
    df: DataFrame,
    strata: list[str],
    frac: float = 0.1,
    id_col: str = "doc_id",
    seed: str = "42",
    holdout: str = "eval",
    remainder: str = "train",
) -> DataFrame:
    """Exact stratified holdout: within EVERY stratum, exactly
    ``ceil(frac · n)`` rows (the smallest md5(seed|id) — the same
    seeded deterministic draw as :func:`sample_exact_n`) are labeled
    ``holdout``, the rest ``remainder``.

    ``hash_split`` gives proportions only in expectation — fine for a
    corpus-wide cut, wrong when every (source, lang) cell must hit its
    quota exactly (small strata can land empty).  This variant pays a
    per-stratum rank window for exactness; strata are
    bounded-cardinality dimensions (source, lang), so the window
    partitioning is the same shape as ntile banding — for
    corpus-with-hot-stratum skew, salt the stratum upstream or fall
    back to hash_split.  The stratum quota is a ``count(*)`` window
    over the SAME partitioning as the rank — it rides the rank's one
    stratum shuffle (no second corpus scan, no group-count join;
    NULL-stratum rows are real window partitions on both, so the old
    null-safe-join concern vanishes by construction).
    """
    if not strata:
        raise ValueError("need at least one stratum column")
    key = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*strata).orderBy(key, F.col(id_col))
    n_in_stratum = F.count(F.lit(1)).over(Window.partitionBy(*strata))
    # round-before-ceil: see rank_quantile_threshold — frac·n an ulp
    # above an integer must not overshoot the "exactly ceil(frac·n)"
    # contract by one row.
    take = F.ceil(F.round(n_in_stratum * F.lit(float(frac)), 9)).cast(
        "bigint"
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .select(
            id_col,
            *strata,
            F.when(F.col("_rk") <= take, F.lit(holdout))
            .otherwise(F.lit(remainder))
            .alias("split"),
        )
    )
