"""Sequence packing and mixture sampling — the last mile between a
curated corpus and training batches.

Extends the reference's curation surface the same way the rest of
:mod:`..datapipe` does (reference has no training-data notion; the
closest analog is its batched-commit sink, `flights.py:119-131`, which
also groups a stream into fixed-size units of work).

Scale design:

- :func:`pack_sequences` — GPT-style concat-and-chunk packing: within
  a shard, documents are concatenated in deterministic id order and
  the token stream is cut into fixed-length training sequences.  The
  only non-projection op is ONE running-sum window per shard; the
  shard is a hash bucket of the id, so window partitions are
  corpus_size / n_shards regardless of data skew — at 100 TB you
  raise ``n_shards`` (10k+) and every window partition stays
  executor-sized.  No global sort, no driver state; adding documents
  only perturbs the shards they hash into.
- :func:`mixture_sample` — deterministic Bernoulli thinning to hit a
  target domain mixture (the DoReMi/Pile-style "sample source s at
  weight w_s").  Per-source keep-rates derive from a tiny groupBy
  (one row per source — broadcast back); the keep decision is a pure
  projection comparing a per-doc uniform hash to the rate.  One scan,
  one broadcast join, zero corpus shuffles, reproducible across
  engines and retries (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _h32, hash_bucket


def uniform_hash(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0,1): first 32 bits of
    md5(id || salt) / 2^32.  Engine-portable via the shared
    :func:`.sampling._h32` core (one place the md5-hex contract
    lives)."""
    h32 = _h32(F.concat(id_col.cast("string"), F.lit(salt)))
    return h32.cast("double") / F.lit(4294967296.0)


def pack_sequences(
    df: DataFrame,
    tokens: Column,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: maps every document to its span
    in the packed token stream of its shard.

    Returns ``(id_col, shard, n_tokens, begin_tok, end_tok, seq_first,
    seq_last)`` where ``begin_tok`` is the document's offset in the
    shard's concatenated stream and ``seq_first``/``seq_last`` are the
    first/last ``seq_len``-sized training sequences it lands in
    (documents may straddle a boundary — standard causal-LM packing,
    where an EOS token separates docs and attention masks handle the
    join).

    Deterministic: shard = md5 bucket of the id, order within shard =
    id ascending, so the packing is stable across runs, engines, and
    cluster sizes.  ``extra_keys`` (e.g. a train/val/test split column)
    become additional stream keys: each (extra_keys..., shard) group is
    its own token stream, so splits never share a training sequence.
    """
    from pyspark.sql import Window

    extra = list(extra_keys or [])
    out = df.select(
        F.col(id_col),
        *extra,
        hash_bucket(F.col(id_col), n_shards).alias("shard"),
        tokens.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*extra, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("end_tok", F.sum("n_tokens").over(w))
    return out.select(
        id_col,
        *extra,
        "shard",
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("begin_tok"),
        "end_tok",
        F.floor((F.col("end_tok") - F.col("n_tokens")) / seq_len).alias("seq_first"),
        # greatest(seq_first, ·): a ZERO-token doc has end_tok ==
        # begin_tok, and floor((end−1)/L) then lands one sequence (or,
        # at stream start, index −1) BEFORE seq_first — an inverted
        # [seq_first, seq_last] range that crashes range-expanding
        # consumers.  Clamp to the empty doc's position sequence.
        F.greatest(
            F.floor((F.col("end_tok") - F.col("n_tokens")) / seq_len),
            F.floor((F.col("end_tok") - 1) / seq_len),
        ).alias("seq_last"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    target_total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Thin the corpus toward a target mixture: source ``s`` should
    contribute ``weights[s] * target_total`` documents (in
    expectation; exact rates, Bernoulli realization).

    keep-rate(s) = min(1, weights[s] * target_total / count(s));
    sources absent from ``weights`` get weight 0 (dropped).  A doc is
    kept iff its :func:`uniform_hash` falls below its source's rate —
    deterministic, so the sample is reproducible and monotone: raising
    a weight only ever ADDS documents, never swaps them.

    The counts groupBy produces one row per source; the join back is
    broadcast by size.  Rates are rounded to 9 decimals so the
    comparison is reproducible across engines.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    if weights:
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        weight = F.coalesce(wmap[F.col(source_col)], F.lit(0.0))
    else:
        # empty create_map() has a VOID value type and fails to
        # analyze on lookup; no weights = drop everything
        weight = F.lit(0.0)
    rates = counts.select(
        source_col,
        F.round(
            F.least(
                F.lit(1.0),
                weight * F.lit(float(target_total)) / F.col("_n"),
            ),
            9,
        ).alias("keep_rate"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(uniform_hash(F.col(id_col), salt) < F.col("keep_rate"))
        .select(id_col, source_col, "keep_rate")
    )


def packing_efficiency(
    packed: DataFrame,
    seq_len: int,
    stream_cols: tuple[str, ...] = ("shard",),
    end_col: str = "end_tok",
) -> DataFrame:
    """Padding-waste accounting over a :func:`pack_sequences` layout:
    per token STREAM, the number of fixed-length training sequences
    the stream fills, the tokens of tail padding the last sequence
    needs, and the fill efficiency — the metric a packing strategy is
    tuned against (concat-and-chunk wastes only the final partial
    sequence per stream; per-doc padding would waste per DOCUMENT).

    ``stream_cols`` must name the SAME keys the packing ran with —
    ``(*extra_keys, shard)`` when :func:`pack_sequences` was given
    ``extra_keys`` (offsets restart per stream, so grouping by shard
    alone would take the max over unrelated streams and misreport
    every metric).

    One partial-agg groupBy over the stream keys (stream count is a
    configuration constant, so the aggregate is a handful of rows);
    no windows, no second scan of the packed frame.
    """
    keys = list(stream_cols)
    per_stream = packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max(end_col).alias("total_tokens"),
    )
    n_seqs = F.floor((F.col("total_tokens") - 1) / F.lit(float(seq_len))) + 1
    capacity = n_seqs * F.lit(seq_len)
    return per_stream.select(
        *keys,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        n_seqs.cast("bigint").alias("n_seqs"),
        (capacity - F.col("total_tokens")).cast("bigint").alias("padded_tokens"),
        # try_divide: a stream whose docs ALL tokenize to zero tokens
        # has n_seqs=0 → capacity 0; efficiency is NULL (undefined),
        # not a divide-by-zero error (ANSI) — DuckDB's x/0 is NULL too.
        F.round(
            F.try_divide(
                F.col("total_tokens").cast("double"), capacity.cast("double")
            ),
            4,
        ).alias("efficiency"),
    )


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.3,
    budget_tokens: int = 100_000,
    source_col: str = "source",
    tokens: Column | None = None,
    text: str = "text",
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual-sampling
    rule of XLM-R / mT5: p_s ∝ n_s^α): one row per source with its
    token mass, normalized sampling weight, and the per-doc keep rate
    that realizes a ``budget_tokens`` training budget.

    α < 1 upweights small sources (α→0 is uniform-over-sources, α=1
    is proportional); keep_rate_s = min(1, p_s·B / n_s) caps at one
    epoch — a rate above 1 means the source must repeat to meet its
    share, surfaced here as the uncapped ``epochs`` column.

    Plan: one partial-agg groupBy to source grain (tiny), the
    normalizer as an unpartitioned window SUM over that source-grain
    frame — bounded by construction (one row per source), so the
    single-partition window is a few rows, and the corpus is scanned
    and tokenized exactly ONCE (a normalizer derived from ``stats``
    as a second aggregate would inline the whole scan+tokenize
    subtree a second time; exchange reuse does not dedupe it because
    the two consumers prune different aggregate columns).
    Pair with :func:`mixture_sample` (feeding ``weight`` in as its
    target mixture) for the per-document Bernoulli realization.
    """
    from pyspark.sql import Window

    from .dedup import normalize_text

    if tokens is None:
        tokens = F.size(F.split(normalize_text(F.col(text)), " "))
    stats = (
        df.select(F.col(source_col), tokens.alias("_t"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").cast("bigint").alias("total_tokens"),
        )
        .withColumn("_pw", F.pow(F.col("total_tokens").cast("double"), F.lit(alpha)))
    )
    z = F.sum("_pw").over(Window.partitionBy())
    p = F.col("_pw") / z
    b = F.lit(float(budget_tokens))
    return (
        stats
        .select(
            source_col,
            "n_docs",
            "total_tokens",
            F.round(p, 6).alias("weight"),
            # try_divide: a source whose caller-supplied token counts
            # sum to 0 must yield NULL epochs/keep_rate, not an ANSI
            # DIVIDE_BY_ZERO abort (same guard as packing_efficiency)
            F.round(F.try_divide(p * b, F.col("total_tokens")), 6).alias(
                "epochs"
            ),
            # the when() guard (not just try_divide) matters: least()
            # IGNORES the NULL and would return 1.0 for a zero-token
            # source — keep_rate is NULL there, like epochs
            F.round(
                F.when(
                    F.col("total_tokens") > 0,
                    F.least(
                        F.lit(1.0),
                        F.try_divide(p * b, F.col("total_tokens")),
                    ),
                ),
                6,
            ).alias("keep_rate"),
        )
    )


def pow2_bucket(n: Column, min_bucket: int = 16, cap: int = 512) -> Column:
    """Smallest power of two >= ``n``, clamped to [min_bucket, cap].

    Integer-exact: the power is ``1 << bit_length(n_eff - 1)`` with the
    bit length read off the binary-string representation — no floating
    ``log2`` whose last-ulp rounding could flip a doc at an exact
    power-of-two boundary into the wrong bucket (and differ between
    engines).  ``cap`` is the model context length: longer docs are
    truncated into the top bucket.
    """
    n_eff = F.least(F.greatest(n, F.lit(1)), F.lit(cap))
    # pow(2, k) is exactly representable in a double for every k ≤ 62,
    # so the bigint cast is exact (shiftleft's numBits arg only takes
    # a Python int, not a per-row column).
    p2 = F.pow(F.lit(2.0), F.length(F.bin(n_eff - 1)).cast("double")).cast("bigint")
    return F.when(n_eff <= min_bucket, F.lit(min_bucket).cast("bigint")).otherwise(
        F.least(p2, F.lit(cap).cast("bigint"))
    )


def length_bucket_batches(
    df: DataFrame,
    tokens: Column,
    seq_len: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    min_bucket: int = 16,
) -> DataFrame:
    """Length-bucketed dynamic batching — the inference/eval-side
    counterpart of :func:`pack_sequences`: instead of concatenating
    docs into one causal stream, group similar-length docs into padded
    batches so attention is never computed over another document and
    padding waste stays bounded by the pow-2 bucket geometry (the
    standard dynamic-batching layout for embedding / reward-model /
    eval inference over a corpus).

    Per doc: ``bucket`` = pow-2 length bucket (docs longer than
    ``seq_len`` truncate into the top bucket), ``batch_idx`` = which
    fixed-token-budget batch of its (shard, bucket) group it lands in
    (each batch holds ``seq_len // bucket`` docs — constant token
    budget per batch regardless of bucket), ``pad`` = padding tokens
    this doc wastes.

    Scale shape: bucket assignment is a pure projection; the only
    non-projection op is ONE row_number window per (shard, bucket)
    partition — the shard is an md5 hash bucket of the id, so
    partitions are corpus_size / (n_shards × n_buckets) regardless of
    length skew; at 100 TB raise ``n_shards`` and every window
    partition stays executor-sized.  Deterministic: shard = md5
    bucket, order within (shard, bucket) = id asc.
    """
    from pyspark.sql import Window

    n_eff = F.least(F.greatest(tokens.cast("bigint"), F.lit(0)), F.lit(seq_len))
    out = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), n_shards).alias("shard"),
        tokens.cast("bigint").alias("n_tokens"),
        n_eff.alias("_n_eff"),
        pow2_bucket(tokens.cast("bigint"), min_bucket, seq_len).alias("bucket"),
    )
    # floor division: true division gives a FRACTIONAL capacity when
    # seq_len is not a multiple of the bucket (seq_len=768, bucket=512
    # → 1.5), and floor(rn/1.5) then packs 2×512 padded tokens into a
    # 768-token batch — past the documented constant token budget.
    capacity = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(F.lit(seq_len) / F.col("bucket")).cast("bigint"),
    )
    w = Window.partitionBy("shard", "bucket").orderBy(id_col)
    return out.select(
        id_col,
        "n_tokens",
        "shard",
        "bucket",
        F.floor((F.row_number().over(w) - 1) / capacity).cast("bigint").alias(
            "batch_idx"
        ),
        (F.col("bucket") - F.col("_n_eff")).cast("bigint").alias("pad"),
    )
