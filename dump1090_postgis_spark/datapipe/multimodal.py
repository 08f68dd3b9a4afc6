"""Multimodal columns: image/audio/video as opaque binary with typed
metadata (generalizes SRC-5, the reference's BYTEA aircraft
silhouettes — read_csv_data.sql:24-38).

The decode/feature steps run as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schemas, batch iteration, partition-preserving
projection) is real and tested, and BMP / PNG / JPEG header parses
(format + dimensions) are REAL byte-level implementations of the
public specs; only full pixel decode is stubbed behind the
``decoder`` seam because the image/audio libraries are not in this
container (clearly marked; wrap PIL/turbojpeg/libav there when
deploying).

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


def _id_schema(df: DataFrame, id_col: str) -> str:
    """``"<id_col> <its actual type>"`` for the mapInPandas output
    schemas: hard-coding ``doc_id bigint`` crashed string-keyed
    corpora in the Python worker (astype int64) and silently RENAMED
    any other id column to doc_id, breaking downstream joins."""
    return f"{id_col} {df.schema[id_col].dataType.simpleString()}"


#: BMP header layout (public format spec): 'BM' magic, then biWidth /
#: biHeight as little-endian SIGNED int32 at byte offsets 18 / 22 —
#: so any payload of ≥26 bytes carries a parseable header.  The
#: reference's silhouettes are .bmp BYTEA (read_csv_data.sql:24-38).
BMP_MIN_HEADER = 26

#: PNG: 8-byte signature, then the IHDR chunk MUST come first (spec):
#: 4-byte length + 'IHDR' at offset 8, width/height as BIG-endian
#: uint32 at offsets 16 / 20 — parseable from any ≥24-byte payload.
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
PNG_MIN_HEADER = 24

#: JPEG: segments between SOI (FFD8) and SOS; dimensions live in the
#: SOFn segment (FFC0-FFCF minus DHT/JPG/DAC): height/width as
#: BIG-endian uint16 at segment offsets +5 / +7.  The scan walks
#: segment length fields, bounded to this many segments.
JPEG_MAX_SEGMENTS = 64


def _jpeg_size(p: bytes):
    """Bounded SOF-marker scan (public JFIF/JPEG spec): walk segments
    from offset 2 via their big-endian length fields until an SOFn
    frame header yields (width, height); None on any malformation."""
    i = 2
    for _ in range(JPEG_MAX_SEGMENTS):
        if i + 4 > len(p) or p[i] != 0xFF:
            return None
        m = p[i + 1]
        if m == 0x01 or 0xD0 <= m <= 0xD9:  # standalone markers, no length
            i += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):  # SOFn
            if i + 9 > len(p):
                return None
            h = int.from_bytes(p[i + 5:i + 7], "big")
            w = int.from_bytes(p[i + 7:i + 9], "big")
            return w, h
        seg = int.from_bytes(p[i + 2:i + 4], "big")
        if seg < 2:
            return None
        i += 2 + seg
    return None


def _decode_image_bytes(payload: bytes) -> dict[str, Any]:
    """BMP / PNG / JPEG: REAL header parses (no codec library needed —
    dimensions sit at fixed offsets or in a bounded marker scan).
    Other formats: a deterministic fake derives pseudo-metadata from
    the byte length so the pipeline shape (schema, nullability, error
    rows) is exercised end-to-end without codec dependencies (swap via
    the ``decoder`` seam of decode_metadata for PIL/turbojpeg/libav —
    full pixel decode stays behind that seam).

    A magic prefix without a complete parseable header falls through
    to the raw path — format detection requires a parseable header.
    """
    if not payload:
        return {"format": None, "width": None, "height": None, "ok": False}
    if payload[:2] == b"BM" and len(payload) >= BMP_MIN_HEADER:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        # biHeight < 0 is a LEGAL top-down BMP (the magnitude is the
        # height); a non-positive width or zero height is not a
        # parseable image — fall through to the raw path instead of
        # poisoning downstream geometry (resize_meta's scale would go
        # negative, and width 0 divides by zero under ANSI).
        if w > 0 and h != 0:
            return {"format": "bmp", "width": w, "height": abs(h), "ok": True}
    if (
        payload[:8] == PNG_MAGIC
        and len(payload) >= PNG_MIN_HEADER
        and payload[12:16] == b"IHDR"
    ):
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return {"format": "png", "width": w, "height": h, "ok": True}
    if payload[:2] == b"\xff\xd8":
        size = _jpeg_size(payload)
        if size is not None:
            return {"format": "jpeg", "width": size[0], "height": size[1], "ok": True}
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


def _be_hex(c, chars: int) -> "F.Column":
    """Non-negative int column → fixed-width big-endian hex chars."""
    return F.lpad(F.hex(c.cast("bigint")), chars, "0")


def synth_png_payload(width, height) -> "F.Column":
    """Minimal 24-byte PNG prefix as binary: 8-byte signature, IHDR
    chunk length + tag, then BE-uint32 width/height at offsets 16/20 —
    pure-projection generator for exercising the real header parser
    (values must be non-negative int32)."""
    return F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),      # signature
            F.lit("0000000D49484452"),      # IHDR length (13) + 'IHDR'
            _be_hex(width, 8), _be_hex(height, 8),
        )
    )


def synth_jpeg_payload(width, height) -> "F.Column":
    """Minimal JPEG stream (17 bytes): SOI, a 2-byte-payload APP0
    segment (forces the scanner to WALK a segment length, not just
    read a fixed offset), then an SOF0 frame header carrying BE-uint16
    height/width (values must fit uint16)."""
    return F.unhex(
        F.concat(
            F.lit("FFD8"),                  # SOI
            F.lit("FFE000040000"),          # APP0, len=4 (2 len + 2 payload)
            F.lit("FFC0000708"),            # SOF0, len=7, precision 8
            _be_hex(height, 4), _be_hex(width, 4),
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
        # _decode_image_bytes / _jpeg_size — a module-level reference
        # would require the package on the executors' PYTHONPATH
        def _stub(payload):
            if not payload:
                return {"format": None, "width": None, "height": None, "ok": False}
            if payload[:2] == b"BM" and len(payload) >= 26:
                w = int.from_bytes(payload[18:22], "little", signed=True)
                h = int.from_bytes(payload[22:26], "little", signed=True)
                # top-down BMP: |h|; non-positive dims → raw path
                # (keep in sync with _decode_image_bytes)
                if w > 0 and h != 0:
                    return {
                        "format": "bmp", "width": w, "height": abs(h),
                        "ok": True,
                    }
            if (
                payload[:8] == b"\x89PNG\r\n\x1a\n"
                and len(payload) >= 24
                and payload[12:16] == b"IHDR"
            ):
                w = int.from_bytes(payload[16:20], "big")
                h = int.from_bytes(payload[20:24], "big")
                return {"format": "png", "width": w, "height": h, "ok": True}
            if payload[:2] == b"\xff\xd8":
                i = 2
                for _ in range(64):
                    if i + 4 > len(payload) or payload[i] != 0xFF:
                        break
                    m = payload[i + 1]
                    if m == 0x01 or 0xD0 <= m <= 0xD9:
                        i += 2
                        continue
                    if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                        if i + 9 > len(payload):
                            break
                        h = int.from_bytes(payload[i + 5:i + 7], "big")
                        w = int.from_bytes(payload[i + 7:i + 9], "big")
                        return {"format": "jpeg", "width": w, "height": h, "ok": True}
                    seg = int.from_bytes(payload[i + 2:i + 4], "big")
                    if seg < 2:
                        break
                    i += 2 + seg
            n = len(payload)
            w = 1 + n % 64
            h = 1 + (n // 64) % 64
            return {"format": "raw", "width": int(w), "height": int(h), "ok": True}

        decode = decoder if decoder is not None else _stub

        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            out = _pd.DataFrame(
                {
                    # id values AND name pass through untouched: an
                    # int64 astype here crashed string ids, and the
                    # fixed "doc_id" name silently renamed custom ids
                    id_col: pdf[id_col],
                    "byte_len": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "ok": [m["ok"] for m in metas],
                }
            )
            yield out

    schema = (
        f"{_id_schema(docs_with_payload, id_col)}, byte_len bigint, "
        "format string, width int, height int, ok boolean"
    )
    return cols.mapInPandas(decode_batches, schema)


def frame_sample_plan(video_meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices 0..n
    step `every_n` — pure sequence/explode, the shuffle-free pattern for
    fan-out decode work lists."""
    return video_meta.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("width") - 1, F.lit(0)), F.lit(every_n))),
    )


def resize_meta(
    decoded: DataFrame, max_w: int = 32, max_h: int = 32
) -> DataFrame:
    """Aspect-preserving resize PLAN over decoded metadata: the target
    dimensions every thumbnailing job needs, as a pure projection —
    scale = min(1, max_w/w, max_h/h), floor-scaled, clamped ≥ 1px.

    The pixel work itself belongs in the :func:`decode_metadata`
    ``decoder=`` seam (PIL/libvips — not in this container); computing
    the geometry ENGINE-side keeps the work list exact (rows where
    scale = 1.0 can skip the codec entirely) and shuffle-free.
    """
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_w)) / w, F.lit(float(max_h)) / h)
    return decoded.select(
        "*",
        F.when(
            F.col("ok") & F.col("width").isNotNull(),
            F.greatest(F.lit(1), F.floor(w * scale).cast("int")),
        ).alias("out_w"),
        F.when(
            F.col("ok") & F.col("height").isNotNull(),
            F.greatest(F.lit(1), F.floor(h * scale).cast("int")),
        ).alias("out_h"),
    )


FEATURE_SCHEMA = (
    "doc_id bigint, bin int, value double"
)


def byte_histogram_features(
    docs_with_payload: DataFrame, id_col: str = "doc_id", bins: int = 16
) -> DataFrame:
    """REAL feature extraction over a binary column: L2-normalized
    byte-value histogram per payload, exploded to (id, bin, value)
    rows — the content-addressable signature that feeds the ANN /
    semantic-dedup operators without any external codec.

    Arrow-batched mapInPandas (numpy bincount per payload — one Python
    round-trip per batch); emits RAW doubles, so callers round with
    ``F.round`` (JVM HALF_UP — the engine's cross-engine convention)
    rather than numpy's half-to-even.  256 must divide evenly into
    ``bins``.
    """
    assert 256 % bins == 0, "bins must divide 256"
    width = 256 // bins
    cols = docs_with_payload.select(id_col, "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, out_bins, vals = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                arr = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                counts = _np.bincount(arr // width, minlength=bins)[:bins]
                norm = _np.sqrt(float((counts.astype(_np.int64) ** 2).sum()))
                v = counts / norm
                # native id values (no int() coercion — string ids)
                ids.extend([i] * bins)
                out_bins.extend(range(bins))
                vals.extend(float(x) for x in v)
            yield _pd.DataFrame(
                {id_col: _pd.Series(ids, dtype="object"),
                 "bin": _pd.Series(out_bins, dtype="int32"),
                 "value": _pd.Series(vals, dtype="float64")}
            )

    schema = f"{_id_schema(docs_with_payload, id_col)}, bin int, value double"
    return cols.mapInPandas(extract, schema)
