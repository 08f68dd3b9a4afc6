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


def _hashed(df: DataFrame, id_col: str, text: str, out: str) -> DataFrame:
    return df.select(id_col, F.md5(normalize_text(F.col(text))).alias(out))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(id_col, status) for every id present in either version."""
    o = _hashed(old, id_col, text, "_ho")
    n = _hashed(new, id_col, text, "_hn")
    status = (
        F.when(F.col("_ho").isNull(), F.lit(ADDED))
        .when(F.col("_hn").isNull(), F.lit(REMOVED))
        .when(F.col("_ho") != F.col("_hn"), F.lit(CHANGED))
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
