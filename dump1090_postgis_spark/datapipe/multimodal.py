"""Multimodal columns: image/audio/video as opaque binary with typed
metadata (generalizes SRC-5, the reference's BYTEA aircraft
silhouettes — read_csv_data.sql:24-38).

The decode/feature steps run as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schemas, batch iteration, partition-preserving
projection) is real and tested; the actual codec calls are stubbed
behind ``_decode_image_bytes`` because the image/audio libraries are
not in this container (clearly marked; swap the stub for
PIL/libav when deploying).

Scale notes: binary payloads never shuffle here — metadata extraction
is a mapPartitions-shaped projection; downstream joins should carry
only (id, metadata) and fetch bytes by id.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, byte_len bigint, format string, width int, height int, ok boolean"
)


#: BMP header layout (public format spec): 'BM' magic, then biWidth /
#: biHeight as little-endian SIGNED int32 at byte offsets 18 / 22 —
#: so any payload of ≥26 bytes carries a parseable header.  The
#: reference's silhouettes are .bmp BYTEA (read_csv_data.sql:24-38).
BMP_MIN_HEADER = 26


def _decode_image_bytes(payload: bytes) -> dict[str, Any]:
    """BMP: REAL header parse (no codec library needed — width/height
    are little-endian int32 at fixed offsets).  Other formats: a
    deterministic fake derives pseudo-metadata from the byte length so
    the pipeline shape (schema, nullability, error rows) is exercised
    end-to-end without codec dependencies (swap via the ``decoder``
    seam of decode_metadata for PIL/turbojpeg/libav).

    A 'BM' prefix without a complete 26-byte header falls through to
    the raw path — format detection requires a parseable header.
    """
    if not payload:
        return {"format": None, "width": None, "height": None, "ok": False}
    if payload[:2] == b"BM" and len(payload) >= BMP_MIN_HEADER:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return {"format": "bmp", "width": w, "height": h, "ok": True}
    # deterministic fake keyed on BYTE LENGTH (not content bytes) so an
    # SQL oracle can restate it with octet_length alone — content-byte
    # arithmetic would diverge from character-based SQL on multibyte
    # UTF-8 payloads
    n = len(payload)
    w = 1 + n % 64
    h = 1 + (n // 64) % 64
    return {"format": "raw", "width": int(w), "height": int(h), "ok": True}


def _le32_hex(c) -> "F.Column":
    """Non-negative int32 column → 8 hex chars, little-endian byte
    order (lpad is safe: hex(int32 ≥ 0) is at most 8 chars)."""
    h8 = F.lpad(F.hex(c.cast("bigint")), 8, "0")
    return F.concat(
        F.substring(h8, 7, 2), F.substring(h8, 5, 2),
        F.substring(h8, 3, 2), F.substring(h8, 1, 2),
    )


def synth_bmp_payload(width, height) -> "F.Column":
    """Minimal 26-byte BMP header as binary: 'BM' magic, 16 zero bytes,
    then LE-int32 width/height at offsets 18/22 — a pure-projection
    payload generator for exercising the real header parser without
    image files (widths/heights must be non-negative int32)."""
    return F.unhex(
        F.concat(
            F.lit("424D"), F.lit("00" * 16), _le32_hex(width), _le32_hex(height)
        )
    )


def attach_binary(docs: DataFrame, text: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 payload stand-in for
    image/audio bytes) plus byte length — the typed-metadata pattern."""
    return docs.withColumn("payload", F.encode(F.col(text), "UTF-8")).withColumn(
        "byte_len", F.length(F.col("payload")).cast("bigint")
    )


def decode_metadata(docs_with_payload: DataFrame, id_col: str = "doc_id",
                    decoder=None) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) batches.

    Partition-preserving; one Python worker round-trip per batch, not
    per row.  The worker closure is fully self-contained (the decode
    fn is captured by value, not by module reference) so it runs on
    executors that cannot import this package — e.g. a driver-created
    session without the repo on the workers' PYTHONPATH.

    ``decoder`` is the real-codec seam: a picklable callable
    ``bytes -> {'format','width','height','ok'}`` (wrap PIL /
    turbojpeg / libav here).  None (default) uses the deterministic
    stub — the oracle path.  The output schema is fixed either way, so
    swapping codecs never touches the surrounding pipeline.
    """
    cols = docs_with_payload.select(id_col, "payload")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        # nested (pickled by value): keep in sync with
        # _decode_image_bytes — a module-level reference would require
        # the package on the executors' PYTHONPATH
        def _stub(payload):
            if not payload:
                return {"format": None, "width": None, "height": None, "ok": False}
            if payload[:2] == b"BM" and len(payload) >= 26:
                w = int.from_bytes(payload[18:22], "little", signed=True)
                h = int.from_bytes(payload[22:26], "little", signed=True)
                return {"format": "bmp", "width": w, "height": h, "ok": True}
            n = len(payload)
            w = 1 + n % 64
            h = 1 + (n // 64) % 64
            return {"format": "raw", "width": int(w), "height": int(h), "ok": True}

        decode = decoder if decoder is not None else _stub

        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            out = _pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "ok": [m["ok"] for m in metas],
                }
            )
            yield out

    return cols.mapInPandas(decode_batches, DECODE_SCHEMA)


def frame_sample_plan(video_meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0..n
    step `every_n` — pure sequence/explode, the shuffle-free pattern for
    fan-out decode work lists."""
    return video_meta.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("width") - 1, F.lit(0)), F.lit(every_n))),
    )
