"""Text-corpus ingestion sources for the LLM-data-pipeline surface.

The reference ingests one wire format (SBS-1 lines, sources/sbs1.py);
training corpora arrive as JSONL / compressed JSONL shards.  The same
SRC-3 discipline applies: a malformed record must be quarantined, not
crash the scan and not silently vanish.

Spark shape: ``spark.read.json`` in PERMISSIVE mode with an explicit
schema (never inferSchema at 100 TB — inference is a full extra pass)
plus ``columnNameOfCorruptRecord``; good and quarantined rows split
from ONE scan.  Compressed shards (.gz/.zst) decode transparently via
the codec from the file extension; a .gz shard is NOT splittable, so
at scale prefer many shard files over few large ones (the standard
JSONL-corpus layout already is that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The documents-table schema as its JSONL wire form.
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a JSONL corpus directory/glob.

    Good rows are fully-parsed records with a non-null ``doc_id`` and
    ``text``; everything else — JSON syntax errors, type mismatches,
    records missing the required fields — lands in the quarantine
    frame as its raw line (SRC-3's keep-the-evidence rule: the
    reference logs the offending line, `adsb_parser.py:247-254`
    behavior class).

    One scan feeds both outputs: the corrupt-record column is part of
    the read schema, so Spark parses each line exactly once and the
    two filters are plain predicates over it.
    """
    # read LINES and parse with from_json so the ORIGINAL text is in
    # hand for every row: the json reader's corrupt-record column only
    # carries the raw line for SYNTAX failures — a valid-JSON record
    # missing a required field would previously be "reconstructed"
    # with to_json over the known schema, dropping null fields and any
    # unknown keys (a lossy quarantine that violates the
    # keep-the-evidence rule and makes the record unrecoverable).
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    # blank / whitespace-only lines (trailing newlines, pretty-printed
    # files) are dropped BEFORE parsing: spark.read.json silently
    # skipped them, and the text+from_json path would otherwise
    # quarantine empty evidence — inflating quarantine counts with
    # rows no one can act on (round-10 advisor).
    raw = (
        spark.read.text(path)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.col("value").alias("_raw"),
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
            ).alias("_r"),
        )
    )
    ok = (
        F.col("_r").isNotNull()
        & F.col(f"_r.{_CORRUPT}").isNull()
        & F.col("_r.doc_id").isNotNull()
        & F.col("_r.text").isNotNull()
    )
    good = raw.filter(ok).select(*[f"_r.{f}" for f in schema.names])
    quarantined = raw.filter(~ok).select(F.col("_raw").alias("raw"))
    return good, quarantined


def write_documents_jsonl(
    docs: DataFrame, path: str, shards: int | None = None, compression: str = "gzip"
) -> None:
    """Sharded JSONL export (the reverse direction): ``shards`` caps
    output file count via a round-robin repartition — omit it to keep
    the upstream partitioning (no extra exchange)."""
    out = docs if shards is None else docs.repartition(shards)
    out.write.mode("overwrite").option("compression", compression).json(path)
