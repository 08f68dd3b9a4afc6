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


#: integral Spark SQL types that bigint-normalize losslessly
_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _id_expr(df: DataFrame, id_col: str):
    """The id column, bigint-normalized when the input type is
    integral (keeps the historical output schema for numeric corpora);
    passed through UNTOUCHED otherwise — ``cast('doc-17' as bigint)``
    is NULL (or an ANSI-mode runtime error), which silently corrupts
    every returned key of a string-id corpus."""
    dt = df.schema[id_col].dataType.simpleString()
    c = F.col(id_col)
    return c.cast("bigint") if dt in _INTEGRAL_TYPES else c


def _norm_query_tokens(tokens: list[str]) -> list[str]:
    """Driver-side twin of :func:`.dedup.normalize_text` for query
    literals (lowercase, collapse whitespace), deduplicated
    order-preserving: the corpus side matches on NORMALIZED words, so
    an unnormalized query term ('Spark') would silently contribute
    zero to every document."""
    out: list[str] = []
    for t in tokens:
        n = " ".join(str(t).lower().split())
        if n and n not in out:
            out.append(n)
    return out


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
    idx = _id_expr(df, id_col)
    tf = _tokens(df, text, id_col).groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.min(idx).alias("min_doc"),
        F.max(idx).alias("max_doc"),
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

    Plan: ZERO corpus shuffles; two scan-bound corpus passes (the
    score projection and the stats reduction — the plan test pins
    exactly two scans).  The normalized words array is staged once per
    row per pass (spread_for_compute guards parallelism); per-term tf
    and the document length are ``size(filter(words, ...))``
    PROJECTIONS — no explode, no (doc,token) aggregation.  Per-term
    document frequencies and the corpus totals reduce to ONE
    single-row frame broadcast back; the
    top-n is a sort-limit (TakeOrderedAndProject); ranks are assigned
    by a window ABOVE the limit, whose input is bounded by ``top_n``
    by construction (not the global-window anti-pattern).
    """
    # normalize + dedupe, order-preserving: the corpus side matches on
    # normalize_text'd words, and a repeated term must not double its
    # contribution (the SQL formulation's (doc, token) GROUP BY dedups)
    query_tokens = _norm_query_tokens(query_tokens)
    if not query_tokens:
        raise ValueError("bm25_topk needs at least one query token")

    words = F.split(normalize_text(F.col(text)), " ")
    staged = spread_for_compute(df, id_col).select(
        F.col(id_col), words.alias("_w")
    )
    def _eq(tokv: str):
        # single-arg closure: a two-parameter lambda would be read by
        # PySpark's higher-order-function arity check as (elem, index)
        return lambda t: t == F.lit(tokv)

    tf_cols = [
        F.size(F.filter(F.col("_w"), _eq(tok))).cast("bigint").alias(f"_tf{i}")
        for i, tok in enumerate(query_tokens)
    ]
    per_doc = staged.select(
        F.col(id_col),
        F.size(F.filter(F.col("_w"), lambda t: t != ""))
        .cast("bigint")
        .alias("dl"),
        *tf_cols,
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"_df{i}")
            for i in range(len(query_tokens))
        ],
    )

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def _contrib(i: int) -> F.Column:
        tf = F.col(f"_tf{i}")
        idf = (F.col("n_docs") - F.col(f"_df{i}") + 0.5) / (
            F.col(f"_df{i}") + 0.5
        )
        tfn = (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * F.col("dl") / avgdl))
        return F.when(
            tf > 0, F.round(idf * tfn * 1e6).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))

    score = sum(
        (_contrib(i) for i in range(len(query_tokens))),
        F.lit(0).cast("bigint"),
    )
    # Hit filter (round-13, guide §2.2 "shuffle fewer bytes" + §1.2):
    # the old form — filter(Σ_tf > 0) ABOVE the projection — was
    # pushed down by Catalyst with the tf aliases SUBSTITUTED, so the
    # scan-level predicate re-tokenized the text once PER QUERY TERM
    # (3 regexp+split per corpus row, then a 4th in the projection).
    # `exists(words, t IN terms)` is boolean-equivalent (tf ≥ 0, so
    # Σ_tf > 0 ⇔ some term present) but tokenizes ONCE and
    # short-circuits on the first hit; applied on `staged` it also
    # pushes below the spread repartition, so only hit rows shuffle.
    # Identical row set and scores by construction; bm25 oracle PASS.
    hit = F.exists(F.col("_w"), lambda t: t.isin(query_tokens))
    per_doc_hits = staged.filter(hit).select(
        F.col(id_col),
        F.size(F.filter(F.col("_w"), lambda t: t != ""))
        .cast("bigint")
        .alias("dl"),
        *tf_cols,
    )
    scored = (
        per_doc_hits.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), score.alias("score_micros"))
    )
    top = scored.select(id_col, "score_micros").orderBy(
        F.col("score_micros").desc(), F.col(id_col)
    ).limit(top_n)

    # Rank over the ≤top_n survivors via a single-partition window —
    # bounded by top_n BY CONSTRUCTION (the limit above), so this is
    # not the global-window anti-pattern.  (A window-free broadcast
    # self-count, as in text.vocab_top_terms, would duplicate the
    # whole corpus subtree into the broadcast branch here.)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_micros").desc(), F.col(id_col))
    return top.select(
        _id_expr(top, id_col).alias(id_col),
        "score_micros",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


def rerank_topk(
    df: DataFrame,
    query_tokens: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k_retrieve: int = 50,
    k_final: int = 10,
    model=None,
) -> DataFrame:
    """Two-stage retrieval: BM25 retrieve ``k_retrieve`` candidates,
    then rerank to ``k_final`` — ``(doc_id, n_query_terms,
    bm25_micros, rank)`` (``rerank_micros`` replaces ``n_query_terms``
    in model mode).

    The default reranker is deterministic and oracle-checkable: the
    count of DISTINCT query terms present in the document (coverage),
    ordered by (coverage desc, bm25 desc, id).  ``model`` is the
    cross-encoder seam, mirroring ``text.language_id_batch``: a batch
    callable ``pandas.Series[str] -> pandas.Series[float]`` (query
    baked in by the caller) run as an Arrow-batched pandas_udf over
    the ≤``k_retrieve`` candidate texts only — the expensive model
    never sees the corpus, just the candidate page.

    Plan: the candidate id set is broadcast back against the corpus
    scan (one broadcast semi-style hash join recovers the candidate
    texts); coverage is an array_contains projection; both windows are
    bounded by ``k_retrieve`` rows by construction.
    """
    query_tokens = _norm_query_tokens(query_tokens)
    cands = bm25_topk(
        df, query_tokens, text=text, id_col=id_col, top_n=k_retrieve
    ).select(id_col, F.col("score_micros").alias("bm25_micros"))

    with_text = df.select(id_col, text).join(F.broadcast(cands), id_col)

    if model is None:
        words = F.split(normalize_text(F.col(text)), " ")
        coverage = sum(
            (F.array_contains(words, tok).cast("int") for tok in query_tokens),
            F.lit(0),
        )
        scored = with_text.select(
            _id_expr(with_text, id_col).alias(id_col),
            coverage.alias("n_query_terms"),
            "bm25_micros",
        )
        rank_col = "n_query_terms"
    else:
        from pyspark.sql.functions import pandas_udf

        # model mode returns its OWN properly-named score column
        # (micro-rounded bigint) instead of overloading n_query_terms
        score_udf = pandas_udf(model, "double")
        scored = with_text.select(
            _id_expr(with_text, id_col).alias(id_col),
            F.round(score_udf(F.col(text)) * 1e6)
            .cast("bigint")
            .alias("rerank_micros"),
            "bm25_micros",
        )
        rank_col = "rerank_micros"

    from pyspark.sql import Window

    w = Window.orderBy(
        F.col(rank_col).desc(), F.col("bm25_micros").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k_final)
        .select(id_col, rank_col, "bm25_micros", "rank")
    )
