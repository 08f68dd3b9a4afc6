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
    staged = with_shingles(docs, text=text, k=k).select(
        id_col, bench_pred.alias("_is_bench"), "_shingles"
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
