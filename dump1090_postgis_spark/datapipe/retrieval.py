"""Retrieval over the document corpus: inverted-index statistics and
BM25 ranked search.

Complements the tf-idf relevance scorer (text.tfidf_top_terms) with
the index-build and query-time halves of a search stack — the pieces
a training-data pipeline uses for corpus exploration and hard-negative
mining.

Scale shapes:
- The index build is explode → partial-agg on the token key; every
  per-token statistic is O(1) aggregation state (df/cf/min/max), never
  an unbounded ``collect_list`` posting — at 100 TB the posting list
  for a stopword is itself TB-sized, so full postings belong in the
  token-bucketed WRITE path (operators/storage.py bucketed writer),
  not in a row.
- BM25 filters the exploded tokens to the query's terms BEFORE the
  shuffle, so the aggregated volume is query-term occurrences only,
  and every joined side except the corpus (term stats, corpus stats)
  is broadcast.

Hash-reproducibility: BM25's ln-idf is replaced by the monotone
rational surrogate ``(N - df + 0.5) / (df + 0.5)`` — IEEE division is
correctly rounded (bit-identical across engines) while ``ln`` may
differ in the last ulp.  Each per-term contribution is rounded to
integer MICROS before the per-doc sum, so the sum is exact bigint
arithmetic — associative, engine-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import explode_computed, normalize_text, spread_for_compute


def _tokens(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(id_col, token) rows, empty tokens dropped; the computed split
    array is staged behind explode_computed so Catalyst cannot
    re-derive it per row under a pushed filter."""
    return explode_computed(
        spread_for_compute(df, id_col),
        F.split(normalize_text(F.col(text)), " "),
        "token",
        keep=[id_col],
    ).filter(F.col("token") != "")


def inverted_postings(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    top_n: int = 100,
) -> DataFrame:
    """Inverted-index statistics for the ``top_n`` highest-df tokens:
    ``(token, df_docs, cf, min_doc, max_doc)``.

    df_docs = document frequency, cf = collection frequency (total
    occurrences); min/max doc id delimit the posting range.  One
    explode + two partial-agg shuffles ((doc,token) then token); the
    top-n cut is a sort-limit Spark executes as TakeOrderedAndProject
    (per-partition heaps, no global sort).
    """
    tf = _tokens(df, text, id_col).groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.min(id_col).cast("bigint").alias("min_doc"),
        F.max(id_col).cast("bigint").alias("max_doc"),
    )
    return stats.orderBy(F.col("df_docs").desc(), F.col("token")).limit(top_n)


def bm25_topk(
    df: DataFrame,
    query_tokens: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """BM25 ranked search: top-``top_n`` docs for ``query_tokens`` as
    ``(doc_id, score_micros, rank)``.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the rational idf surrogate documented in the module docstring;
    ``score_micros`` is the bigint sum of per-term micro-rounded
    contributions.  ``avgdl`` is exact: an integer token-count sum
    divided once (no float accumulation order).

    Plan: corpus-side volume is only the query terms' occurrences
    (filter *before* the (doc,token) shuffle); term df and corpus
    stats are broadcast single-digit-row frames; the top-n is a
    sort-limit (TakeOrderedAndProject); ranks are assigned to the
    ≤top_n survivors by a window-free broadcast self-count, same
    pattern as text.vocab_top_terms — no single-partition WindowExec
    anywhere.
    """
    if not query_tokens:
        raise ValueError("bm25_topk needs at least one query token")
    toks = _tokens(df, text, id_col)
    tf = (
        toks.filter(F.col("token").isin(*query_tokens))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))

    words = F.split(normalize_text(F.col(text)), " ")
    dl = df.select(
        F.col(id_col),
        F.size(F.filter(words, lambda t: t != "")).cast("bigint").alias("dl"),
    )
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )

    idf = (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    tfn = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    contrib = F.round(idf * tfn * 1e6).cast("bigint")

    scored = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(F.sum(contrib).cast("bigint").alias("score_micros"))
    )
    top = scored.orderBy(
        F.col("score_micros").desc(), F.col(id_col)
    ).limit(top_n)

    # Window-free rank over the ≤top_n survivors: rank = 1 + number of
    # strictly-preceding rows under the (score desc, id asc) total
    # order — an O(top_n²) broadcast comparison, trivial at this size.
    left = top.select(
        F.col(id_col).alias("_id"), F.col("score_micros").alias("_s")
    )
    rank = (
        left.join(
            F.broadcast(top),
            (F.col("score_micros") > F.col("_s"))
            | ((F.col("score_micros") == F.col("_s")) & (F.col(id_col) < F.col("_id"))),
            "left",
        )
        .groupBy("_id", "_s")
        .agg((F.count(F.col(id_col)) + 1).cast("bigint").alias("rank"))
    )
    return rank.select(
        F.col("_id").cast("bigint").alias(id_col),
        F.col("_s").alias("score_micros"),
        "rank",
    )
