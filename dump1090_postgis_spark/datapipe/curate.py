"""One-pass document curation: the composition a training-data
pipeline actually runs — language ID + quality scoring + token counts
+ exact-dup canonical flag over the whole corpus.

Plan shape: every per-document feature is a projection fused into the
SAME scan (language markers, quality ratios, token regexes, content
hash are all Column expressions — whole-stage codegen'd together);
the ONLY shuffle is the dup-group min over the content hash.  At
100 TB that is the minimum possible movement for "annotate every doc
and pick one canonical copy per duplicate cluster".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text
from .text import language_id, quality_score, token_count_regex


def curate_documents(
    docs: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Annotate every document and flag the canonical copy per exact-dup
    cluster (min id wins — the dedup.exact_dedup rule, inlined so the
    corpus is scanned once)."""
    t = F.col(text)
    annotated = docs.select(
        id_col,
        language_id(t).alias("pred_lang"),
        quality_score(t).alias("quality"),
        token_count_regex(t).cast("bigint").alias("re_tokens"),
        F.md5(normalize_text(t)).alias("_h"),
    )
    w = Window.partitionBy("_h")
    return (
        annotated.withColumn("_keep", F.min(id_col).over(w))
        .select(
            id_col, "pred_lang", "quality", "re_tokens",
            (F.col(id_col) == F.col("_keep")).alias("is_canonical"),
        )
    )
