"""Corpus-level repeated-passage mining: document frequency of word
k-shingles, coverage filtering, and passage masking.

Part of the LLM-training-data extension surface (no analog in the
reference — SURVEY §6): the across-corpus complement of the
within-document repetition features in :mod:`.text` and the
whole-document near-dup families in :mod:`.dedup`.  The semantics are
the word-granularity version of ExactSubstr / duplicate-passage
removal (Lee et al., "Deduplicating Training Data Makes Language
Models Better"): a passage that recurs verbatim across many documents
(boilerplate, license headers, navigation chrome) is mined by its
corpus document-frequency, and documents are either filtered on the
fraction of their tokens covered by such passages, or rewritten with
the covered spans masked.

Shape, Spark-first:

- positional k-grams are a STAGED projection (normalize+split once per
  row, grams by ``element_at`` — the :func:`..dedup.with_shingles`
  discipline); the (position, gram) pairs explode via
  ``explode_outer`` to dodge the ``InferFiltersFromGenerate``
  recompute trap (see :func:`..dedup.explode_computed`);
- document frequency is ONE shuffle, on the gram key, with map-side
  partial counts; per-doc distinctness comes free from
  ``array_distinct`` inside the projection, never from a
  (doc, gram)-keyed shuffle;
- the frequent-passage set is SMALL by construction (document
  frequency is Zipfian; the ``min_df`` tail is the whole point) →
  **broadcast** to the probe side, so the corpus never shuffles to
  discover its covered positions;
- the only corpus-keyed shuffle is the per-doc start-position rollup
  and its equi-join back to the documents — both on the corpus
  primary key, co-located under bucketed storage
  (:mod:`..operators.storage`).

At 100 TB: scan → staged gram projection → broadcast-hash probe →
partial-count rollup on doc id → pk join.  No all-pairs step exists
anywhere; cost is linear in corpus tokens plus the (small) frequent
set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import explode_computed, normalize_text, spread_for_compute

#: Word-shingle width.  Real pipelines mine 10–50-gram passages; the
#: synthetic corpus' short docs make 3 the interesting width.
DEFAULT_K = 3

#: A passage is "frequent" when it appears in at least this many
#: distinct documents.
DEFAULT_MIN_DF = 4

#: Keep documents whose frequent-passage token coverage is at or
#: below this fraction.
DEFAULT_MAX_COVERAGE = 0.5

#: Replacement token for masked (covered) positions.
MASK_TOKEN = "[DUP]"


def _with_words(df: DataFrame, text: str) -> DataFrame:
    """Stage normalize+split once per row (multi-reference, non-cheap
    → CollapseProject keeps the stage; split runs once regardless of
    how many gram expressions consume it)."""
    return df.withColumn(
        "_pw", F.split(normalize_text(F.col(text)), " ")
    ).withColumn("_pn", F.size("_pw"))


def _gram_at(i: Column, k: int) -> Column:
    return F.concat_ws(
        " ", *[F.element_at(F.col("_pw"), i + off) for off in range(k)]
    )


def _positional_grams(k: int) -> Column:
    """array<struct<p,g>> of every k-gram start position (1-based).
    Documents shorter than ``k`` words yield an empty array — they
    contain no k-gram and can never be covered."""
    idx = F.sequence(F.lit(1), F.col("_pn") - k + 1)
    arr = F.transform(idx, lambda i: F.struct(i.alias("p"), _gram_at(i, k).alias("g")))
    return F.when(F.col("_pn") >= k, arr).otherwise(
        F.array().cast("array<struct<p:int,g:string>>")
    )


def _distinct_grams(
    docs: DataFrame, text: str, id_col: str, k: int
) -> DataFrame:
    """(id_col, g) — one row per DISTINCT k-gram per document: the
    staged words projection + ``array_distinct`` over the positional
    grams, exploded through :func:`.dedup.explode_computed` (the
    InferFiltersFromGenerate-safe explode).  ONE definition shared by
    :func:`passage_doc_freq` and :func:`gram_novelty`, so "the same
    k-gram" can never drift between the doc-frequency and novelty
    sides."""
    staged = _with_words(spread_for_compute(docs, id_col), text)
    return explode_computed(
        staged,
        F.array_distinct(F.transform(_positional_grams(k), lambda x: x["g"])),
        "g",
        keep=[id_col],
    )


def passage_doc_freq(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = DEFAULT_K
) -> DataFrame:
    """(g, n_docs): corpus document frequency of every k-gram.

    Per-doc distinctness via ``array_distinct`` in the projection, so
    the single shuffle (groupBy gram) counts documents, not
    occurrences, without a count-distinct expansion.
    """
    return (
        _distinct_grams(docs, text, id_col, k)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def frequent_passages(
    docs: DataFrame,
    min_df: int = DEFAULT_MIN_DF,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """The mined boilerplate set: k-grams in ≥ ``min_df`` documents.
    Small by Zipf — the broadcast side of every probe below."""
    return passage_doc_freq(docs, text, id_col, k).filter(
        F.col("n_docs") >= min_df
    )


def _covered_starts(
    docs: DataFrame, freq: DataFrame, text: str, id_col: str, k: int
) -> DataFrame:
    """(id_col, n_tokens, _starts): start positions of frequent grams
    per document — broadcast-hash probe, then a partial-count rollup
    keyed on the doc id (only matching rows reach the shuffle).

    Gram construction happens AFTER the explode (round-13, guide §4):
    building the (p, g) struct array up front ran the whole gram
    concat inside an interpreted ``transform`` (CodegenFallback);
    exploding just the START INDEX and deriving the gram as a
    post-Generate scalar projection (element_at + concat_ws over the
    carried words array) whole-stage-codegens — measured exec ×0.81
    at sf0.1, identical (p, g) rows (same positions, same concat).
    ``_pw`` is dropped in the same projection, so the wide rows live
    only inside the codegen pipeline, never at the join or shuffle."""
    staged = _with_words(spread_for_compute(docs, id_col), text).withColumn(
        "n_tokens", F.col("_pn")
    )
    # same short-doc gate as _positional_grams: _pn < k ⇒ no k-gram
    # (sequence() would otherwise COUNT DOWN and fabricate starts)
    idx = F.when(
        F.col("_pn") >= k, F.sequence(F.lit(1), F.col("_pn") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    pos = explode_computed(
        staged, idx, "_p", keep=[id_col, "n_tokens", "_pw"]
    ).select(
        id_col, "n_tokens", "_p", _gram_at(F.col("_p"), k).alias("_g")
    )
    return (
        pos.join(F.broadcast(freq.select("g")), pos["_g"] == F.col("g"))
        .groupBy(id_col)
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.collect_list(F.col("_p")).alias("_starts"),
        )
    )


def _covered_positions(k: int) -> Column:
    """Distinct token positions covered by the matched starts."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_starts"), lambda p: F.sequence(p, p + F.lit(k - 1))
            )
        )
    )


def passage_coverage(
    docs: DataFrame,
    min_df: int = DEFAULT_MIN_DF,
    max_coverage: float = DEFAULT_MAX_COVERAGE,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-document frequent-passage coverage and keep verdict.

    Output: (id_col, n_tokens, covered_tokens, coverage, keep) for
    EVERY document; ``keep`` = coverage ≤ ``max_coverage``.  Coverage
    counts distinct token positions under any frequent k-gram, so
    overlapping passages never double-count.
    """
    freq = frequent_passages(docs, min_df, text, id_col, k)
    hits = _covered_starts(docs, freq, text, id_col, k).select(
        id_col, F.size(_covered_positions(k)).alias("covered_tokens")
    )
    base = docs.select(
        id_col,
        F.size(F.split(normalize_text(F.col(text)), " ")).alias("n_tokens"),
    )
    out = base.join(hits, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias("covered_tokens"),
        F.round(
            F.coalesce("covered_tokens", F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            4,
        ).alias("coverage"),
    )
    return out.withColumn("keep", F.col("coverage") <= max_coverage)


def mask_passages(
    docs: DataFrame,
    min_df: int = DEFAULT_MIN_DF,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    mask: str = MASK_TOKEN,
) -> DataFrame:
    """Rewrite each document with covered positions replaced by
    ``mask``: (id_col, n_tokens, n_masked, masked_text).

    The rewrite is a pure projection over the pk-joined start
    positions; emit ``md5(masked_text)`` downstream when only the
    digest needs to travel (see the registry query).
    """
    freq = frequent_passages(docs, min_df, text, id_col, k)
    hits = _covered_starts(docs, freq, text, id_col, k).select(
        id_col, _covered_positions(k).alias("_covered")
    )
    staged = _with_words(docs.select(id_col, text), text)
    j = staged.join(hits, id_col, "left").withColumn(
        "_cov", F.coalesce("_covered", F.array().cast("array<int>"))
    )
    masked_words = F.transform(
        F.sequence(F.lit(1), F.col("_pn")),
        lambda i: F.when(
            F.array_contains(F.col("_cov"), i), F.lit(mask)
        ).otherwise(F.element_at(F.col("_pw"), i)),
    )
    return j.select(
        id_col,
        F.col("_pn").cast("bigint").alias("n_tokens"),
        F.size("_cov").cast("bigint").alias("n_masked"),
        F.concat_ws(" ", masked_words).alias("masked_text"),
    )


def gram_novelty(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = DEFAULT_K
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's DISTINCT k-grams
    whose first corpus occurrence (minimum ``id_col``) is this doc —
    the freshness signal an ordered-ingest pipeline uses to downrank
    documents that only restate earlier material (a soft,
    doc-granular complement to passage masking).

    Returns ``(id_col, n_grams, n_novel, novelty)``; documents
    shorter than ``k`` words have no k-gram and are absent (same
    semantics as :func:`passage_doc_freq`).

    Scale shape: the gram set is the same staged
    projection+array_distinct as :func:`passage_doc_freq`; first-seen
    is ONE groupBy-min on the gram key, and the join back is on that
    same key — co-partitioned with the aggregation's exchange, so the
    sort-merge join reuses it.  Final doc-grain rollup is a
    partial-agg groupBy.  No windows, nothing corpus-wide on the
    driver.
    """
    exploded = _distinct_grams(docs, text, id_col, k)
    first = exploded.groupBy("g").agg(F.min(id_col).alias("_first"))
    return (
        exploded.join(first, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
            ).cast("bigint").alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 4),
        )
    )
