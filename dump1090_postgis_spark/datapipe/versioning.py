"""Corpus version diffing — the dataset-maintenance counterpart of
JOIN-4's keep-latest maintenance (operators/dedup.py): given two
versions of a document corpus, classify every id as added / removed /
changed / unchanged.

Training-data pipelines re-crawl and re-filter; the diff is what
gates an incremental re-run (only ``added``/``changed`` docs re-enter
dedup/quality/packing — see :func:`..dedup.incremental_lsh_pairs`).

Spark shape: each side reduces to (id, content-hash) in its scan
projection — md5 of the normalized text, the exact-dedup convention —
then ONE full-outer hash join on the primary key.  Both shuffles are
pk-keyed, co-located under bucketed storage (operators/storage.py),
and the join carries 2×16-byte hashes per row, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

ADDED, REMOVED, CHANGED, UNCHANGED = "added", "removed", "changed", "unchanged"


def _hashed(
    df: DataFrame, id_col: str, text: str, out: str, flag: str
) -> DataFrame:
    # the literal-true presence flag travels with each side: md5 of a
    # NULL text is NULL, so hash nullness is NOT an existence test —
    # using it as one misclassifies a NULL-text doc present on both
    # sides as added/removed (and changed_set then drops or re-runs
    # the wrong documents).
    return df.select(
        id_col,
        F.md5(normalize_text(F.col(text))).alias(out),
        F.lit(True).alias(flag),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(id_col, status) for every id present in either version.

    Presence is tested on per-side flags (not hash nullness) and the
    hash comparison is null-safe, so NULL-text documents diff
    correctly: NULL→NULL is unchanged, NULL→'x' is changed."""
    o = _hashed(old, id_col, text, "_ho", "_po")
    n = _hashed(new, id_col, text, "_hn", "_pn")
    status = (
        F.when(F.col("_po").isNull(), F.lit(ADDED))
        .when(F.col("_pn").isNull(), F.lit(REMOVED))
        .when(~F.col("_ho").eqNullSafe(F.col("_hn")), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return o.join(n, id_col, "full_outer").select(id_col, status.alias("status"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(status, n): the four counts — partial-agg rollup of the diff."""
    return (
        corpus_diff(old, new, id_col, text)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def changed_set(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The re-processing work list: NEW-side rows whose content is new
    or changed — what an incremental pipeline actually re-runs."""
    work = corpus_diff(old, new, id_col, text).filter(
        F.col("status").isin(ADDED, CHANGED)
    )
    return new.join(work.select(id_col), id_col, "left_semi")


def source_overlap(
    df: DataFrame,
    text: str = "text",
    group_col: str = "source",
    key=None,
) -> DataFrame:
    """Cross-source duplicate-mass matrix: for every unordered source
    pair (a < b), how many DISTINCT normalized texts appear in both —
    the governance table that tells a corpus owner which ingest feeds
    are re-crawling each other before mixture weights double-count
    them.

    ``key`` overrides the identity used for "the same text": default
    is the exact normalized-text md5; pass a coarser fingerprint
    Column (a shingle/prefix hash, a MinHash band, a SimHash bucket)
    to measure NEAR-duplicate mass instead — the shape of the plan is
    identical, only the projected key changes.

    Scale shape: texts travel as md5 hashes only; ONE distinct on
    (hash, source) — cardinality ≤ corpus — then a self-equi-join on
    the hash key.  Fan-out per hash is bounded by the source count
    (a configuration constant), so the join output is ≤ distinct
    texts × sources², never corpus².  Final rollup is a partial-agg
    groupBy on the tiny (a, b) key space.
    """
    key_col = F.md5(normalize_text(F.col(text))) if key is None else key
    d = df.select(
        key_col.alias("_h"),
        F.col(group_col).alias("_s"),
    ).distinct()
    a = d.select("_h", F.col("_s").alias("src_a"))
    b = d.select("_h", F.col("_s").alias("src_b"))
    return (
        a.join(b, "_h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_texts"))
    )
