"""One-pass document curation: the composition a training-data
pipeline actually runs — language ID + quality scoring + token counts
+ exact-dup canonical flag over the whole corpus.

Plan shape: every per-document feature is a projection fused into the
SAME scan (language markers, quality ratios, token regexes, content
hash are all Column expressions — whole-stage codegen'd together).
The canonical-copy flag comes from groupBy(content hash) → min(id)
joined back on the hash, NOT a window min:

- the groupBy does map-side PARTIAL aggregation, so only
  (hash, min id) pairs cross the wire for the agg side — a window
  min would shuffle and sort every full annotated row of a duplicate
  cluster into one task (a corpus that is 30% one boilerplate doc
  sends 30% of the data to one partition);
- the agg-side scan is pruned to (hash, id) by Catalyst, so the
  expensive language/quality expressions run once, on the annotated
  side only;
- AQE can split a skewed join partition (OptimizeSkewedJoin) and can
  broadcast the min-id side when the distinct-hash count is small —
  neither escape hatch exists for WindowExec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .text import language_id, quality_score, token_count_regex


def curate_documents(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Annotate every document and flag the canonical copy per exact-dup
    cluster (min id wins — the dedup.exact_dedup rule, inlined so the
    annotated corpus is scanned once and only (hash, min id) pairs move
    for the duplicate-cluster reduction)."""
    t = F.col(text)
    content_hash = F.md5(normalize_text(t))
    annotated = docs.select(
        id_col,
        language_id(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        token_count_regex(t).cast("bigint").alias("re_tokens"),
        content_hash.alias("_h"),
    )
    mins = (
        docs.select(content_hash.alias("_h"), F.col(id_col).alias("_keep"))
        .groupBy("_h")
        .agg(F.min("_keep").alias("_keep"))
    )
    return annotated.join(mins, "_h").select(
        id_col, "pred_lang", "quality", "re_tokens",
        (F.col(id_col) == F.col("_keep")).alias("is_canonical"),
    )
