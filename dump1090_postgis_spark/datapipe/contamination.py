"""Benchmark decontamination: flag training documents that share
word n-grams with a held-out benchmark/eval set.

The standard contamination check (e.g. GPT-3 appendix C, PaLM §C.2 —
13-gram overlap) is a semi-join between the corpus's n-gram set and
the benchmark's n-gram set.  Shape it Spark-first:

- the benchmark side is SMALL by construction (eval sets are
  thousands of docs, not billions) → distinct its n-grams and
  **broadcast**; the corpus side then never shuffles — one scan,
  map-side hash probe per n-gram;
- corpus n-grams come from the same staged shingle projection the
  dedup family uses (:func:`..dedup.with_shingles` — split once per
  row, shingle by element_at, array_distinct) so per-doc work is
  linear in text length;
- the per-doc hit count is a groupBy on doc id AFTER the broadcast
  join filter — only matching (doc, n-gram) rows reach it, and the
  partial count keeps the shuffle at one row per doc per map
  partition.

At 100 TB the plan is: scan corpus → project n-grams → explode →
broadcast-hash-join (probe) → partial-count groupBy.  No corpus-sized
shuffle anywhere; the explode inflates rows ~n_words× but is pipelined
into the probe, which immediately filters to the (rare) hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles

#: Real pipelines use 13-grams (GPT-3/PaLM convention); the default
#: here is sized for the short synthetic test corpus.
DEFAULT_NGRAM = 8


def ngram_contamination(
    docs: DataFrame,
    bench_pred: Column,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document benchmark n-gram hits.

    ``bench_pred`` selects the benchmark rows out of ``docs`` (the
    common self-contamination audit); rows matching it are the
    contamination source and are excluded from the output.  Returns
    (id_col, n_hits) for every NON-benchmark document sharing ≥1
    k-gram with the benchmark set.

    Shingles are distinct per doc, so ``n_hits`` counts distinct
    shared k-grams without a count-distinct shuffle.
    """
    from .dedup import explode_computed, spread_for_compute

    docs = spread_for_compute(docs, id_col)
    # coalesce the predicate: a NULL bench_pred (e.g. source = 'bench'
    # over a NULL source) is not-benchmark, so the doc must land on
    # the CHECKED side — with the raw predicate, filter(pred) and
    # filter(~pred) BOTH reject NULL and a contaminated NULL-predicate
    # doc silently passes decontamination.
    staged = with_shingles(docs, text=text, k=k).select(
        id_col,
        F.coalesce(bench_pred, F.lit(False)).alias("_is_bench"),
        "_shingles",
    )
    grams = explode_computed(
        staged, F.col("_shingles"), "g", keep=[id_col, "_is_bench"]
    )
    bench = grams.filter(F.col("_is_bench")).select("g").distinct()
    return (
        grams.filter(~F.col("_is_bench"))
        .join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    bench_pred: Column,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_NGRAM,
) -> DataFrame:
    """The corpus minus contaminated docs: left-anti join against the
    hit set (benchmark rows themselves are kept — drop them with the
    predicate upstream if the split demands it)."""
    hits = ngram_contamination(docs, bench_pred, text, id_col, k)
    return docs.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Fuzzy (near-duplicate) decontamination
# ---------------------------------------------------------------------------


def fuzzy_contamination(
    docs: DataFrame,
    bench_pred: Column,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    hash_family: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Training documents that are NEAR-DUPLICATES of a benchmark/eval
    document — the fuzzy tier of the contamination family (exact
    n-gram overlap alone misses eval items that were paraphrased,
    truncated, or re-wrapped before they leaked into a crawl; the
    published pipelines run both tiers — e.g. the GPT-3 appendix-C
    dedup removes documents with high eval overlap, and Llama-style
    pipelines pair it with MinHash near-dup against eval sets).

    Composition of the two scale-proven kernels, nothing new moves:
    candidates from :func:`.dedup.incremental_lsh_pairs` with the
    BENCHMARK side in the broadcast seat (eval sets are thousands of
    docs; the training corpus is scanned once into banded signature
    rows and never shuffles), then exact k-shingle Jaccard >
    ``threshold`` via :func:`.dedup.jaccard_pairs`.

    Returns one row per flagged training document:
    ``(id_col, n_bench_matches, max_jaccard)``.  Benchmark rows are
    the contamination SOURCE and never appear in the output.

    ``max_bucket_size=None`` keeps every band bucket: the corpus-hot
    buckets the cap exists to drop are exactly boilerplate a
    contaminated eval item may share; dropping them risks false
    negatives in an audit whose cost model (bench side broadcast)
    doesn't need the cap.  Pass :data:`.dedup.DEFAULT_MAX_BUCKET_SIZE`
    to restore the dedup family's bound when auditing against a large
    noisy benchmark set.
    """
    from .dedup import incremental_lsh_pairs, jaccard_pairs

    pred = F.coalesce(bench_pred, F.lit(False))
    bench = docs.filter(pred)
    train = docs.filter(~pred)
    # k reaches BOTH tiers: candidates are generated in the same
    # k-shingle space the exact-Jaccard verify scores (a k mismatch
    # between tiers gives unpredictable recall — round-12 advice).
    cands = incremental_lsh_pairs(
        train, bench, text, id_col, num_hashes, bands, hash_family,
        max_bucket_size, k=k,
    )
    verified = jaccard_pairs(
        docs,
        cands.select(
            F.col("corpus_id").alias("id_a"), F.col("new_id").alias("id_b")
        ),
        text, id_col, k=k, threshold=threshold,
    )
    return verified.groupBy(F.col("id_a").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    bench_pred: Column,
    text: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The corpus minus near-duplicate-contaminated docs — the fuzzy
    twin of :func:`decontaminate` (same anti-join shape; benchmark
    rows themselves are kept, drop them upstream if the split demands
    it)."""
    hits = fuzzy_contamination(docs, bench_pred, text, id_col, **kwargs)
    return docs.join(hits.select(id_col), id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination
# ---------------------------------------------------------------------------

#: Bloom sizing: m bits / k hashes.  At the default 2^16 bits the
#: bitmap is 8 KiB — a plan-side literal-class payload; production
#: sizing is m ≈ 10–15 bits per benchmark gram (e.g. 2^27 bits = 16 MiB
#: for a 10M-gram eval suite — still broadcast-class).
DEFAULT_BLOOM_BITS = 1 << 16
DEFAULT_BLOOM_HASHES = 5


def _bloom_bit(col: str, seed: int, n_bits: int):
    """Bit index of `seed`'s hash of string column `col` — the seed is
    hashed as a second INT column, which is how both the build and the
    probe sides derive k independent-enough hash functions from one
    xxhash64."""
    return F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(n_bits))


def bloom_bitmap(
    grams: DataFrame,
    col: str = "g",
    n_bits: int = DEFAULT_BLOOM_BITS,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
) -> DataFrame:
    """Distributed bloom-filter build: ONE row holding the bitmap as
    ``array<bigint>`` (n_bits/64 words).

    Pure DataFrame — per-gram bit positions explode to (word, mask)
    rows, ``bit_or`` partial-aggregates per word (map-side combine, at
    most n_bits/64 rows reach the final reduce), and the single-row
    array materializes via map_from_entries + a dense index transform.
    No driver collect: the bitmap row rides to consumers as a
    broadcast single-row crossJoin (the sampling.py threshold-frame
    pattern).
    """
    n_words = n_bits // 64
    pos = grams.select(
        F.explode(
            F.array(*[_bloom_bit(col, s, n_bits) for s in range(n_hashes)])
        ).alias("bit")
    )
    words = pos.select(
        F.expr("bit div 64").alias("w"),
        F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("m"),
    )
    agg = words.groupBy("w").agg(F.bit_or("m").alias("word"))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0).cast("bigint")
        ),
    )
    return agg.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("_m")
    ).select(dense.alias("_bloom"))


def _might_contain(col: str, n_bits: int, n_hashes: int):
    """Boolean membership probe against a ``_bloom`` array column in
    scope.  Bit positions are staged per seed; word lookup + variable
    shift run through SQL exprs (the PySpark shiftleft wrapper only
    takes literal shift amounts)."""
    from functools import reduce

    conds = []
    for s in range(n_hashes):
        bit = f"pmod(xxhash64({col}, {s}), {n_bits})"
        conds.append(
            F.expr(
                f"(element_at(_bloom, cast(({bit}) div 64 as int) + 1)"
                f" & shiftleft(1L, cast(({bit}) % 64 as int))) != 0"
            )
        )
    return reduce(lambda a, b: a & b, conds)


def ngram_contamination_bloom(
    docs: DataFrame,
    bench_pred: Column,
    text: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_NGRAM,
    n_bits: int = DEFAULT_BLOOM_BITS,
    n_hashes: int = DEFAULT_BLOOM_HASHES,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """:func:`ngram_contamination` with a bloom prefilter — IDENTICAL
    output (bloom has no false negatives; the exact verify join removes
    its false positives), different scale profile.

    Why it exists: the plain path broadcasts the benchmark's full
    distinct gram STRINGS and hash-probes every corpus gram against
    them.  With a large eval suite the broadcast hash table is the
    bottleneck (gram strings dominate); here the first probe is an
    O(bits) bitmap — 8 KiB vs megabytes — so the (rare) bloom
    survivors alone reach the exact string join.  At 100 TB the
    corpus side stays a single scan either way; the bloom cuts the
    probe's memory footprint and the exact join's input by ~the true
    contamination rate + bloom FPR.
    """
    from pyspark import StorageLevel

    from .dedup import explode_computed, spread_for_compute

    docs = spread_for_compute(docs, id_col)
    # NULL bench_pred → checked side: same coalesce rationale as
    # ngram_contamination (a raw predicate drops NULL rows from BOTH
    # sides and contamination leaks through).
    staged = with_shingles(docs, text=text, k=k).select(
        id_col,
        F.coalesce(bench_pred, F.lit(False)).alias("_is_bench"),
        "_shingles",
    )
    grams = explode_computed(
        staged, F.col("_shingles"), "g", keep=[id_col, "_is_bench"]
    )
    # the gram set feeds BOTH the bitmap build and the exact verify
    # join; each reference re-runs the benchmark scan + shingle +
    # distinct.  Pass ``caches`` to persist it across the two
    # references (release via operators.ids.release_caches once the
    # output is materialized) — that is the 100 TB calling convention,
    # where the benchmark re-scan dwarfs the pin.  The persist is
    # OPT-IN because it is measurably slower at small scale (the pin's
    # serialization + stage break cost more than the re-scan: solo
    # min-of-3 at sf0.1 measured 1.95 s recompute vs 2.58 s pinned)
    # and a default pin without a reachable handle would leak.
    bench = grams.filter(F.col("_is_bench")).select("g").distinct()
    if caches is not None:
        bench = bench.persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(bench)
    bitmap = bloom_bitmap(bench, "g", n_bits, n_hashes)
    survivors = (
        grams.filter(~F.col("_is_bench"))
        .crossJoin(F.broadcast(bitmap))
        .filter(_might_contain("g", n_bits, n_hashes))
        .select(id_col, "g")
    )
    return (
        survivors.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
