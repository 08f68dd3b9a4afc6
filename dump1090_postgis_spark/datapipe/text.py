"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All pure Column expressions (codegen'd, projection-only — these run at
scan speed on 100 TB with zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalize_text

# Deterministic marker-word sets per language (tiny n-gram-heuristic
# stand-in; swap for fastText/CLD3 via a Pandas UDF when available).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "es", "una", "y"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _words(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def _marker_hits(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def language_id(text: Column) -> Column:
    """Predicted language = argmax over marker-hit counts; 'und' when no
    marker matches.  Ties break by language code order (deterministic).
    """
    words = _words(text)
    scored = F.array(
        *[
            F.struct(
                _marker_hits(words, m).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def language_id_batch(df, text: str = "text", out: str = "pred_lang",
                      model=None):
    """Language-ID with a pluggable real-model seam.

    ``model`` is a batch callable ``pandas.Series[str] ->
    pandas.Series[str]`` (the natural shape for fastText / CLD3 /
    transformers batch predict).  When given, it runs as an
    Arrow-batched pandas_udf — vectorized transfer, one Python call
    per batch.  When None (default), the deterministic marker-word
    expression is used — the oracle path stays pure-JVM and
    hash-checkable.  Either way the output schema is identical, so
    swapping models never touches the surrounding pipeline.
    """
    if model is None:
        return df.withColumn(out, language_id(F.col(text)))

    import pandas as pd  # noqa: F401  (documents the seam contract)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _predict(s):
        return model(s)

    return df.withColumn(out, _predict(F.col(text)))


#: Default dimensionality of the no-model hashed-BoW embedding — small
#: enough that the 16 per-bucket count expressions stay cheap, large
#: enough for the ANN consumers to have non-trivial geometry.
DEFAULT_EMBED_DIM = 16


def embed_texts(df, model=None, text: str = "text", out: str = "embedding",
                dim: int = DEFAULT_EMBED_DIM):
    """Batch embedding inference with a pluggable real-model seam — the
    most-used production member of the model-seam family
    (:func:`language_id_batch` for classification,
    ``retrieval.rerank_topk`` for cross-encoders): compute an
    ``array<double>`` embedding column from a text column.

    ``model`` is a batch callable ``pandas.Series[str] -> iterable of
    list[float]`` (the sentence-transformers ``encode`` shape).  When
    given, it runs as an Arrow-batched ``pandas_udf`` — vectorized
    transfer, one Python call per batch, scan-parallel with zero
    shuffle (the embedding pass over 100 TB is embarrassingly parallel;
    the model rides the executor).

    When ``model=None`` (default), a DETERMINISTIC hashed bag-of-words
    embedding is computed pure-JVM — the feature-hashing trick
    (Weinberger et al., ICML 2009): each normalized word hashes to one
    of ``dim`` buckets via the md5-prefix bucket this package already
    uses for splits (``sampling.hash_bucket``), and the bucket-count
    vector is L2-normalized.  Engine-portable (md5 + integer counts +
    IEEE sqrt/divide are bit-identical in DuckDB), so the whole
    embed→ANN pipeline is oracle-checkable; swapping in a real model
    never touches the surrounding pipeline — identical output schema.

    Plan shape (default path): staged projections — words, then
    buckets, then the count vector — so the interpreted higher-order
    expressions evaluate once per row each (the :func:`with_shingles`
    discipline); per row the cost is O(dim · n_words) comparisons, and
    the column is computed at scan speed with zero shuffle.
    """
    if model is not None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def _embed(s):
            return pd.Series([
                None if v is None else [float(x) for x in v]
                for v in model(s)
            ])

        return df.withColumn(out, _embed(F.col(text)))

    words = F.split(
        normalize_text(F.coalesce(F.col(text), F.lit(""))), " "
    )
    # word → bucket: first 8 hex chars of md5, as an unsigned 32-bit
    # int, mod dim — bit-identical to DuckDB's
    # ('0x' || substr(md5(w), 1, 8))::BIGINT % dim
    bucket = lambda w: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
        F.lit(dim),
    )
    def _is_bucket(i: int):
        # single-parameter lambda factory — a default-arg two-parameter
        # lambda would receive the array INDEX as its second argument
        # (the PySpark higher-order-function convention), silently
        # shadowing the bucket id (the dedup._seeded_hash pitfall)
        return lambda b: b == F.lit(i)

    counts = F.array(*[
        F.size(F.filter(F.col("_eb_buckets"), _is_bucket(i))).cast("double")
        for i in range(dim)
    ])
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("_eb_counts"), lambda x: x * x),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    return (
        df.withColumn("_eb_buckets", F.transform(words, bucket))
        .withColumn("_eb_counts", counts)
        .withColumn("_eb_norm", norm)
        .withColumn(
            out,
            # norm is 0 only for an all-empty bucket vector, which the
            # normalize path can't produce (even '' hashes somewhere),
            # but guard the divide for model-swapped callers feeding
            # pre-tokenized empties.
            F.when(
                F.col("_eb_norm") > 0,
                F.transform(
                    F.col("_eb_counts"), lambda c: c / F.col("_eb_norm")
                ),
            ).otherwise(F.col("_eb_counts")),
        )
        .drop("_eb_buckets", "_eb_counts", "_eb_norm")
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: word chunks + standalone punctuation
    (regexp, engine-portable)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def quality_features(text: Column, words: Column | None = None) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features, rounded for
    cross-engine float stability.

    ``words`` lets a DataFrame-level caller supply a PRE-STAGED
    normalize+split column so the interpreted split runs once per row
    (see :func:`with_quality_score`); by default the split is inlined
    into each feature expression.
    """
    words = _words(text) if words is None else words
    n_words = F.size(words)
    n_chars = F.length(text)
    stop_hits = _marker_hits(words, STOPWORDS)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_words": n_words.cast("bigint"),
        # numerator = sum of NORMALIZED word lengths, not raw n_chars
        # minus separators: the old (n_chars − (n_words−1)) identity
        # only holds for single-space-separated text — '  a   b  '
        # counted its extra whitespace as word characters and
        # overstated the average.
        "avg_word_len": F.round(
            F.aggregate(
                F.transform(words, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / n_words,
            4,
        ),
        "stopword_ratio": F.round(stop_hits.cast("double") / n_words, 4),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
    }


def _score_from_features(f: dict[str, Column]) -> Column:
    """The one place the composite quality formula lives."""
    len_score = F.least(f["n_words"].cast("double") / 100.0, F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - f["punct_ratio"] * 10.0, F.lit(0.0))
    return F.round((len_score + stop_score + punct_penalty) / 3.0, 4)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    mid-range document length, penalizes punctuation soup.

    Column-level form — the words subtree appears (and is evaluated)
    several times inside the one expression; for hot paths scoring a
    whole corpus use ``with_quality_score``, which stages the split
    once per row.
    """
    return _score_from_features(quality_features(text))


def with_quality_score(df, text: str = "text", out: str = "quality"):
    """``quality_score`` with the normalize+split words array staged as
    a named column, so the interpreted split/filter subtrees run once
    per row instead of once per reference (~3× in the inline form).
    Same formula object (``_score_from_features`` over
    ``quality_features``) — only the words Column differs — so the two
    forms cannot drift; bit-equality is pinned in tests."""
    staged = df.withColumn("_qs_w", _words(F.col(text)))
    f = quality_features(F.col(text), words=F.col("_qs_w"))
    return staged.withColumn(out, _score_from_features(f)).drop("_qs_w")


def _all_grams(words: Column, k: int) -> Column:
    """ALL k-word grams (with repeats — unlike dedup's distinct
    shingles, repetition scoring needs the multiset)."""
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - k + 1)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(words, i + off) for off in range(k)])

    return F.when(n >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(
    df, text: str = "text", id_col: str = "doc_id", ks: tuple[int, ...] = (2, 3)
):
    """Gopher-style repetition filters (Rae et al. 2021, Table A1):
    for each k in ``ks``, the fraction of the document's words covered
    by occurrences of its MOST FREQUENT k-gram — high values flag
    boilerplate/spam (Gopher drops docs with top-2-gram frac > 0.20,
    top-3-gram frac > 0.18).

    Scale shape: finding the mode of a per-doc multiset is a
    shuffle-grouping, not a projection — an expression form would scan
    each doc's gram array once per DISTINCT gram (quadratic in doc
    length).  So: one scan projects all (k, gram) pairs per doc, ONE
    explode feeds groupBy(doc, k, gram) → count (partial agg), then
    groupBy(doc, k) → max, and a conditional-agg pivot back to one row
    per doc.  Both groupBys hash on doc id prefixes, so AQE coalesces
    them into the same exchange lineage; output rows = corpus rows.
    """
    from .dedup import explode_computed, spread_for_compute

    staged = spread_for_compute(df, id_col).select(
        id_col, F.split(normalize_text(F.col(text)), " ").alias("_w")
    )
    def _tag(k: int):
        # single-param lambda factory — a two-parameter lambda would
        # receive the array INDEX as its second argument (see
        # dedup._seeded_hash)
        return lambda g: F.struct(F.lit(k).alias("k"), g.alias("g"))

    tagged = F.flatten(
        F.array(*[F.transform(_all_grams(F.col("_w"), k), _tag(k)) for k in ks])
    )
    sized = staged.select(id_col, F.size("_w").alias("_nw"), "_w")
    exploded = explode_computed(sized, tagged, "kg", keep=[id_col, "_nw"]).select(
        id_col, "_nw", F.col("kg.k").alias("k"), F.col("kg.g").alias("g")
    )
    top = (
        exploded.groupBy(id_col, "_nw", "k", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "_nw", "k")
        .agg(F.max("c").alias("mc"))
    )
    # least(·, 1.0): overlapping occurrences each count k words, so
    # 'a a a a' has mc=3 for the 2-gram 'a a' and the raw ratio is
    # 1.5 — the column is documented as a FRACTION of words covered,
    # so cap it (Gopher-style thresholds are unaffected; consumers
    # treating it as [0,1] for calibration/blending are protected).
    fracs = [
        F.round(
            F.max(
                F.when(
                    F.col("k") == k,
                    F.least(F.col("mc") * k / F.col("_nw"), F.lit(1.0)),
                )
            ),
            4,
        ).alias(f"top{k}_frac")
        for k in ks
    ]
    return top.groupBy(id_col).agg(*fracs)


FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def word_value(w: Column) -> Column:
    """Cheap engine-portable word hash: 31*len + codepoint of first
    char."""
    return F.length(w) * 31 + F.ascii(F.substring(w, 1, 1))


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over words, mod 1e9+7 — document
    fingerprint usable as a cheap near-dup / shard key."""
    words = _words(text)
    vals = F.transform(words, word_value)
    return F.aggregate(
        vals,
        F.lit(0).cast("bigint"),
        lambda acc, v: F.pmod(
            acc * FINGERPRINT_BASE + v.cast("bigint"), F.lit(FINGERPRINT_MOD)
        ),
    )


# ---------------------------------------------------------------------------
# PII / URL scrubbing
# ---------------------------------------------------------------------------

#: Redaction patterns, most-specific first (emails before bare hosts).
#: Written in the RE2-compatible subset (explicit classes, no
#: backreferences, no lookaround) so the same pattern string runs
#: under Java regex (Spark) and RE2 (DuckDB oracle) identically.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ \t\n]+", "<URL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def scrub_counts(text: Column) -> dict[str, Column]:
    """Per-pattern match counts (what WOULD be redacted) — pure
    projection, scan-speed."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast(
            "bigint"
        )
        for name, pat, _ in SCRUB_PATTERNS
    }


def scrub_text(text: Column) -> Column:
    """Redact all :data:`SCRUB_PATTERNS` occurrences with typed
    placeholders.  Order matters: emails are consumed before the URL
    pattern can eat an `@`-bearing query string, IPs last."""
    out = text
    for _, pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

def token_rarity(
    df,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Per-document mean inverse unigram probability under the
    corpus's OWN unigram distribution — the engine's hash-stable
    stand-in for the KenLM/CCNet perplexity quality signal (CCNet
    buckets documents by LM perplexity; the arithmetic mean of 1/p is
    the same signal's upper bound — the geometric mean of 1/p IS
    perplexity — and needs no model artifact, only the corpus).  High
    rarity = unusual/garbled tokens; low = boilerplate.  Filter both
    tails, like CCNet's head/middle/tail split.

    Determinism device (the tf-idf ratio-idf discipline, one step
    further): a float ``avg`` over per-token doubles is summation-
    ORDER-dependent, so instead each token contributes the integer
    ``floor(N / n_token)`` (both engines: one correctly-rounded double
    division + floor), the per-doc SUM is exact bigint arithmetic
    (order-independent), and a single final division produces the
    mean — bit-stable against the DuckDB oracle with no rounding
    slack.  The floor loses <1 per token, noise for a quality signal.

    Scale shape: explode to (doc, token) → token-keyed partial-agg
    count (the only corpus-sized shuffle) → counts join back (AQE
    broadcasts a small vocab) → per-doc partial agg.  Returns
    ``(id_col, n_tokens, rarity)``; docs with zero tokens are absent.
    """
    from .dedup import explode_computed, spread_for_compute

    tokens = explode_computed(
        spread_for_compute(df, id_col), _words(F.col(text)), "token",
        keep=[id_col],
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("_n"))
    # N derives from the BASE frame (sum of per-doc token counts = the
    # token row count, one projection pass) and the per-token
    # floor(N/n) attaches on the COUNTS side — computed once per
    # DISTINCT token, not per occurrence.  The scalar/count refs go
    # through the DataFrame objects (exprId-based): every name-based
    # formulation of this crossJoin trips Spark 4's self-join
    # disambiguation with AMBIGUOUS_REFERENCE, because all three
    # frames share the corpus scan's lineage.
    total = df.select(
        F.size(
            F.filter(_words(F.col(text)), lambda w: w != F.lit(""))
        ).alias("_c")
    ).agg(F.sum("_c").cast("bigint").alias("_N"))
    rare = counts.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(total["_N"].cast("double") / counts["_n"])
        .cast("bigint")
        .alias("_rare"),
    )
    return (
        tokens.join(rare, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_rare").alias("_rare_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("_rare_sum").cast("double") / F.col("n_tokens"), 6
            ).alias("rarity"),
        )
    )


def tfidf_top_terms(
    df,
    text: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
):
    """Top-``top_n`` most characteristic terms per document under a
    tf-idf-style relevance score.

    Scale shape: explode to (doc, term) → **partial-agg** groupBy for
    term frequency (the only corpus-sized shuffle, combiner-reduced to
    distinct terms per doc) → document frequency from the tf frame
    (second partial agg, one row per term) → idf broadcast back → per-
    doc top-n window (groups are docs — naturally small partitions).

    The idf uses the RATIO form ``(N + 1) / (df + 1)`` rather than its
    logarithm: IEEE division is correctly rounded and thus bit-
    reproducible across engines, while ``ln`` implementations may
    differ in the last ulp — this keeps the score (and therefore the
    top-n ORDER) hash-stable against the DuckDB oracle.  Monotone in
    the usual ln-idf, so the per-doc ranking it induces is the
    standard one whenever tf ties; scores are rounded to 6 decimals.
    """
    from pyspark.sql import Window

    from .dedup import explode_computed, spread_for_compute

    terms = explode_computed(
        spread_for_compute(df, id_col), _words(F.col(text)), "term", keep=[id_col]
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    # dfreq is one row per distinct term — usually broadcast-sized, but
    # a 100 TB junk-token vocabulary can exceed the threshold, so leave
    # the strategy to AQE (runtime size) instead of forcing broadcast.
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.col("n_docs") + 1).cast("double")
                / (F.col("df") + 1),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return scored.withColumn(
        "term_rank", F.row_number().over(w).cast("int")
    ).filter(F.col("term_rank") <= top_n)


# ---------------------------------------------------------------------------
# Token chunking (context-window splitting) and vocabulary build
# ---------------------------------------------------------------------------

def chunk_tokens(
    df,
    text: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
):
    """Split each document into fixed-size token chunks with overlap —
    the standard context-window preparation step (LM pretraining cuts
    long documents into ``window``-token pieces every ``stride``
    tokens; ``window - stride`` tokens of overlap preserve cross-chunk
    context).

    Scale shape: pure projection + generate — the token array is
    materialized ONCE per document as a column, the exploded array is
    just the (cheap) 1-based start-offset sequence, and each chunk is
    a ``slice`` of the carried token array.  Zero shuffles; output
    rows ≈ corpus tokens / stride.  ``explode_computed`` keeps
    Catalyst from substituting the sequence through an inferred
    ``size > 0`` filter (the sequence is never empty by construction:
    ``greatest(n, 1)``).

    Every document emits ≥1 chunk (an empty text yields one
    empty-string chunk) so chunking never silently drops documents.
    """
    from .dedup import explode_computed, spread_for_compute

    toks = spread_for_compute(df, id_col).select(
        id_col, _words(F.col(text)).alias("_toks")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("_toks"), F.lit(1)), F.lit(stride)
    )
    exploded = explode_computed(toks, starts, "_st", keep=[id_col, "_toks"])
    chunk = F.slice(F.col("_toks"), F.col("_st"), window)
    return exploded.select(
        id_col,
        F.floor((F.col("_st") - 1) / stride).cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def vocab_top_terms(df, text: str = "text", top_n: int = 100):
    """Corpus vocabulary: global token counts, ranked (count desc,
    token asc — deterministic), truncated to ``top_n``.

    Scale shape: one explode + ONE partial-agg groupBy (the corpus-
    sized shuffle carries combiner-reduced (token, count) partials);
    the top-``top_n`` cut is a sort-limit, which Spark executes as
    TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver, never a full vocabulary sort and never a single-partition
    WindowExec.  Ranks are then assigned by a broadcast theta
    self-join over the ≤``top_n`` survivors (rank = 1 + rows strictly
    ahead in the total order), so no global window appears anywhere
    in the plan.

    The rank self-join is O(top_n²) comparisons inside a
    BroadcastNestedLoopJoin — negligible at the default ``top_n=100``
    (10⁴ cheap predicates) and fine to ~5k, but quadratic beyond: for
    a full tokenizer-scale vocabulary (10⁵-10⁶ entries) use
    :func:`vocab_rank_table` (partitioned two-pass dense-id ranking,
    no self-join and no global window) and pin the result with
    :func:`materialize_vocab`.
    """
    from .dedup import explode_computed, spread_for_compute

    tokens = explode_computed(
        spread_for_compute(df), _words(F.col(text)), "token", keep=[]
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(top_n)
    a, b = top.alias("_a"), top.alias("_b")
    ahead = (F.col("_b.n") > F.col("_a.n")) | (
        (F.col("_b.n") == F.col("_a.n")) & (F.col("_b.token") < F.col("_a.token"))
    )
    return (
        a.join(F.broadcast(b), ahead, "left")
        .groupBy(F.col("_a.token").alias("token"), F.col("_a.n").alias("n"))
        .agg((F.count(F.col("_b.token")) + F.lit(1)).cast("long").alias("rank"))
    )


def vocab_rank_table(df, text: str = "text", min_count: int = 1, caches=None):
    """FULL ranked vocabulary — the tokenizer-scale path
    :func:`vocab_top_terms`'s docstring points at: every surviving
    token with its corpus count and dense rank (count desc, token asc),
    with NO top-k cut, NO O(V²) rank self-join, and NO global window.

    Scale shape: one explode + one partial-agg groupBy (identical to
    vocab_top_terms), an optional ``min_count`` pre-filter (the
    standard vocabulary floor — drops the hapax tail BEFORE ranking),
    then rank via ``operators.ids.with_dense_ids`` over (-count,
    token): the two-pass range-partitioned assignment — rank order is
    total and deterministic, each partition numbers its own rows, and
    the only driver-side data is the per-partition count array.
    A 10⁶-token vocabulary ranks without any single-task sort.

    ``caches``: with_dense_ids pins a DISK_ONLY vocabulary-layout
    frame for CORRECTNESS (its partition boundaries must be identical
    across its two passes).  PASS A LIST and release it with
    ``operators.ids.release_caches`` once the output is materialized —
    with the default ``caches=None`` the pin has no reachable handle
    and stays on executor disk for the session lifetime (bounded by
    vocabulary size, but it accumulates across repeated calls).
    """
    from ..operators.ids import with_dense_ids
    from .dedup import explode_computed, spread_for_compute

    tokens = explode_computed(
        spread_for_compute(df), _words(F.col(text)), "token", keep=[]
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    ranked = with_dense_ids(
        counts.withColumn("_neg_n", -F.col("n")), ["_neg_n", "token"], "rank",
        caches=caches,
    )
    return ranked.select("token", F.col("n").cast("bigint").alias("n"), "rank")


# Vocab rows above this count are pinned by persist, not collected to
# the driver — the documented collect budget for materialize_vocab.
VOCAB_COLLECT_BUDGET = 1_000


def materialize_vocab(vocab, budget: int = VOCAB_COLLECT_BUDGET):
    """Pin a vocabulary PLAN so every downstream reference reuses one
    computed result instead of re-running the corpus aggregation per
    subplan reference (the lazy-reference hazard documented on
    jaccard_pairs).

    ≤``budget`` rows: collected and re-created as a driver-literal
    local relation (the attribution-literal pattern — zero scans in
    consumers, broadcast-join friendly).  Above the budget (a
    tokenizer-scale 10⁵-10⁶-token vocab): persist + count barrier —
    the aggregation runs exactly once here, consumers read the pinned
    partitions, and NOTHING above the budget is ever collected to the
    driver.  Caller owns ``unpersist()`` in the large case.
    """
    from pyspark.storagelevel import StorageLevel

    pinned = vocab.persist(StorageLevel.MEMORY_AND_DISK)
    n = pinned.count()  # barrier: the vocab plan executes exactly once
    if n <= budget:
        rows = pinned.collect()
        pinned.unpersist()
        # literal_dim, not createDataFrame: the latter is a pickled
        # Python-RDD leaf that relaunches Python workers on EVERY
        # downstream action; a VALUES LocalRelation is the
        # "driver-literal local relation" this docstring promises
        # (round-12 literal-dim sweep)
        from ..sources.dims import literal_dim

        try:
            return literal_dim(
                vocab.sparkSession, [tuple(r) for r in rows], vocab.schema
            )
        except TypeError:
            # literal_dim renders only string/bool/int/double/array/
            # struct; vocab-shaped frames with other types (float,
            # decimal, date, timestamp, map, binary) keep the
            # createDataFrame behavior they always had.
            return vocab.sparkSession.createDataFrame(rows, vocab.schema)
    return pinned


def apply_vocab(
    df,
    vocab,
    text: str = "text",
    id_col: str = "doc_id",
):
    """Tokenize against a fixed vocabulary: per document, total tokens,
    out-of-vocabulary tokens, and the OOV rate — the coverage check run
    before committing to a tokenizer vocab (a rate spike on one
    language/source flags a vocab that under-serves it).

    Scale shape: one explode of the corpus (the only corpus-sized
    frame), a BROADCAST left join against the vocab (vocabularies are
    bounded — top-k by construction here), then a partial-agg groupBy
    back to document grain.  Docs whose normalized text has no tokens
    contribute no exploded rows and are absent from the output (same
    semantics in the oracle).
    """
    from .dedup import explode_computed, spread_for_compute

    tokens = explode_computed(
        spread_for_compute(df), _words(F.col(text)), "token", keep=[id_col]
    ).filter(F.col("token") != "")
    marked = tokens.join(
        F.broadcast(vocab.select("token").withColumn("_in_v", F.lit(1))),
        "token",
        "left",
    )
    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return agg.select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 4
        ).alias("oov_rate"),
    )


def zipf_stats(df, text: str = "text", caches=None):
    """One-row corpus frequency-distribution summary — the data-card
    statistics a corpus release publishes about its token
    distribution: type count, total tokens, type/token ratio, the
    head share (top-ranked token's fraction of all tokens), and the
    Zipf slope (least-squares slope of ln(count) on ln(rank) over the
    FULL ranked vocabulary — natural text sits near -1; a slope far
    from it is a corpus-health signal for boilerplate or synthetic
    spam).

    Scale shape: the ranked vocabulary comes from
    :func:`vocab_rank_table` (two-pass partitioned dense ranking —
    no global window), and the summary is ONE partial-agg aggregate
    over the vocabulary-sized frame; ``regr_slope`` is a built-in
    running-sums aggregate (sum x, sum y, sum xy, sum x²) so the
    regression never materializes points anywhere.

    ``caches``: pass a list and ``release_caches`` it after collecting
    the one-row result — the ranked vocabulary's internal DISK_ONLY
    layout pin (see :func:`vocab_rank_table`) otherwise lives until
    the session ends.
    """
    ranked = vocab_rank_table(df, text=text, min_count=1, caches=caches)
    n = F.col("n").cast("double")
    rank = F.col("rank").cast("double")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("n").cast("bigint").alias("total_tokens"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("n").cast("double"), 6
        ).alias("type_token_ratio"),
        F.round(
            F.max(F.when(F.col("rank") == 1, F.col("n"))).cast("double")
            / F.sum("n").cast("double"),
            6,
        ).alias("top_share"),
        F.round(F.regr_slope(F.log(n), F.log(rank)), 4).alias("zipf_slope"),
    )


def collocation_pmi(df, text: str = "text", min_count: int = 5):
    """Adjacent-bigram collocations by pointwise mutual information:
    ``pmi = ln( p(ab) / (p(a) p(b)) )`` with bigram and unigram
    probabilities from the corpus itself — the classic collocation /
    multi-word-expression detector (Church & Hanks 1990), and a
    vocabulary-merge signal for tokenizer training.

    ``min_count`` floors the bigram count BEFORE the pmi math — an
    integer cut, so the surviving row set is engine-exact (a float
    top-k cut could disagree across engines in the last ulp at the
    boundary); pmi itself is emitted rounded.

    Scale shape (round-13, guide §1.2/§2.2 — ONE corpus pass): the
    previous two-explode form referenced the staged token array from
    five aggregation consumers (unigram counts ×2 join sides +
    unigram total, bigram counts, bigram total) and Catalyst inlined
    the scan+tokenize+explode subtree into EACH — five corpus passes
    in the physical plan, with runtime exchange reuse measured
    unreliable here.  Now a single explode emits (token,
    next-token-or-NULL) per position — every fact derives from its
    one (a, b) groupBy:

    - unigram count of t  = Σ n_ab over groups with a = t (each
      position contributes exactly one row, NULL-b for the last
      token of a doc);
    - bigram counts/total = the valid-b groups (post-agg filter —
      group keys can't contaminate each other);
    - totals are vocabulary-sized rollups.

    The (a, b) aggregate is lazily localCheckpoint'd (the semdedup
    staging precedent): the first consumer materializes it inside its
    own job, the other four read the persisted VOCAB-sized blocks —
    the corpus is scanned, tokenized, exploded, and shuffled exactly
    once.  All downstream inputs are the same integers as before, so
    the rounded pmi is bit-identical.  No windows.
    """
    from .dedup import explode_computed, spread_for_compute

    staged = spread_for_compute(df).select(_words(F.col(text)).alias("_w"))
    # (a = w[i], b = w[i+1] | NULL-past-end) for every position i —
    # F.get is 0-based and NULL past the end (ANSI-safe; element_at
    # would throw there), so the last token carries b = NULL.
    pair_arr = F.transform(
        F.col("_w"),
        lambda w, i: F.struct(
            w.alias("a"), F.get(F.col("_w"), i + 1).alias("b")
        ),
    )
    ex = explode_computed(staged, pair_arr, "_ab", keep=[]).select(
        F.col("_ab")["a"].alias("a"), F.col("_ab")["b"].alias("b")
    ).filter(F.col("a") != "")
    bic_all = (
        ex.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    # a valid bigram needs a non-empty second token; (a, NULL) and
    # (a, "") rows exist only to carry a's unigram occurrence.
    _valid_b = F.col("b").isNotNull() & (F.col("b") != "")
    uni = bic_all.groupBy("a").agg(F.sum("n_ab").alias("n_t")).select(
        F.col("a").alias("t"), F.col("n_t").cast("bigint").alias("n_t")
    )
    n_uni = uni.agg(F.sum("n_t").alias("_nu"))
    bic = bic_all.filter(_valid_b & (F.col("n_ab") >= min_count))
    n_bi = bic_all.filter(_valid_b).agg(F.sum("n_ab").alias("_nb"))

    ua = uni.select(F.col("t").alias("a"), F.col("n_t").alias("n_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("n_t").alias("n_b"))
    return (
        bic.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            # + 0.0: a pmi rounding to zero from below must be +0.0,
            # not -0.0, identically on every engine
            (
                F.round(
                    F.log(
                        (F.col("n_ab").cast("double") / F.col("_nb"))
                        / (
                            (F.col("n_a").cast("double") / F.col("_nu"))
                            * (F.col("n_b").cast("double") / F.col("_nu"))
                        )
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )
