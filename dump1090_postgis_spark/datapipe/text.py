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


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: word chunks + standalone punctuation
    (regexp, engine-portable)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features, rounded for
    cross-engine float stability."""
    words = _words(text)
    n_words = F.size(words)
    n_chars = F.length(text)
    stop_hits = _marker_hits(words, STOPWORDS)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_words": n_words.cast("bigint"),
        "avg_word_len": F.round(
            (n_chars - (n_words - 1)).cast("double") / n_words, 4
        ),
        "stopword_ratio": F.round(stop_hits.cast("double") / n_words, 4),
        "punct_ratio": F.round(n_punct.cast("double") / F.greatest(n_chars, F.lit(1)), 4),
    }


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards stopword presence and
    mid-range document length, penalizes punctuation soup."""
    f = quality_features(text)
    len_score = F.least(f["n_words"].cast("double") / 100.0, F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - f["punct_ratio"] * 10.0, F.lit(0.0))
    return F.round((len_score + stop_score + punct_penalty) / 3.0, 4)


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
    staged = df.select(
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
    exploded = staged.select(
        id_col, F.size("_w").alias("_nw"), F.explode(tagged).alias("kg")
    ).select(id_col, "_nw", F.col("kg.k").alias("k"), F.col("kg.g").alias("g"))
    top = (
        exploded.groupBy(id_col, "_nw", "k", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "_nw", "k")
        .agg(F.max("c").alias("mc"))
    )
    fracs = [
        F.round(
            F.max(F.when(F.col("k") == k, F.col("mc") * k / F.col("_nw"))), 4
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
