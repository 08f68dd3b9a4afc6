"""Pure-Python twin of the xxhash64 banded-signature artifact.

The production MinHash path (``plans.datapipe_queries
.q_dedup_minhash_lsh_fast``) materializes its banded xxhash64
signatures to parquet and the DuckDB oracle replays candidate
generation from that artifact.  That made the oracle's green depend on
EXECUTION ORDER: a driver that evaluated the oracle before the Spark
query — or cold-started the artifact dir — got a spurious red even
though the code under test was correct.

This module removes the ordering assumption: it re-derives the exact
artifact WITHOUT Spark — normalize → split → 3-shingles → 16 seeded
xxhash64 minima → 4 banded keys, bit-identical to
``datapipe.dedup.minhash_banded`` (pinned by
``tests/test_dedup.py::test_python_artifact_twin_matches_spark``) —
so the oracle path can compute-if-missing before any SQL runs.

The xxHash64 algorithm is public (Yann Collet's xxHash spec, BSD-2;
Spark's Catalyst ``XxHash64`` applies it per input value, chaining the
result as the next value's seed, with seed 42).  Only the three value
shapes Spark's expression uses here are implemented: int32 literal
(the seed index — PySpark ``lit(i)`` is IntegerType), UTF-8 string
bytes, and the 64-bit avalanche.
"""

from __future__ import annotations

import os
import re

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_int(i: int, seed: int) -> int:
    """xxHash64 of one 4-byte int — Spark's ``XXH64.hashInt``."""
    h = (seed + _P5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_long(l: int, seed: int) -> int:
    """xxHash64 of one 8-byte long — Spark's ``XXH64.hashLong``."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((l & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def xxh64_bytes(b: bytes, seed: int) -> int:
    """xxHash64 of a byte string — Spark's ``XXH64.hashUnsafeBytes``
    (standard xxHash64 over the UTF-8 bytes)."""
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(b[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(b[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(b[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(b[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(b[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(b[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def spark_xxhash64_int_str(i: int, s: str) -> int:
    """``F.xxhash64(F.lit(i), col)`` for an int32 literal and a string
    column: Spark chains per-value hashes, each value's seed being the
    previous result, starting at 42.  Returns the SIGNED long Spark
    produces."""
    h = xxh64_int(i, SPARK_HASH_SEED)
    return _signed(xxh64_bytes(s.encode("utf-8"), h))


# --- shingle/signature twin of datapipe.dedup -------------------------

_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s — NOT unicode-aware


def _shingles(text: str, k: int = 3) -> list[str]:
    """Twin of ``dedup.with_shingles``: lower → trim(' ') → collapse
    Java-\\s runs → split(' ') → distinct k-word windows (or the whole
    text when fewer than k words)."""
    norm = _WS.sub(" ", text.lower().strip(" "))
    words = norm.split(" ")
    if len(words) >= k:
        seen = dict.fromkeys(
            " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
        )
        return list(seen)
    return [" ".join(words)]


def banded_rows(
    doc_id: int, text: str, num_hashes: int = 16, bands: int = 4
) -> list[tuple[int, int, str]]:
    """(_id, band, key) rows for one document — twin of
    ``dedup.minhash_banded`` with the xxhash64 family."""
    sh = _shingles(text)
    sig = [
        min(spark_xxhash64_int_str(i, s) for s in sh)
        for i in range(num_hashes)
    ]
    rpb = num_hashes // bands
    return [
        (doc_id, b, "|".join(str(v) for v in sig[b * rpb : (b + 1) * rpb]))
        for b in range(bands)
    ]


def ensure_banded_artifact(
    sf_dir: str, path: str, max_rows: int = 100_000
) -> bool:
    """Compute-if-missing guard: when the banded-signature artifact is
    absent, derive it from ``<sf_dir>/documents.parquet`` in pure
    Python and write it — making the DuckDB oracle self-sufficient
    regardless of whether the Spark query has run yet.  Returns True
    when it materialized something.

    Sized for the ORACLE scale only (the driver pins sf0.01, 500
    docs ≈ a second of pure Python): the production path is still the
    Spark plan, which overwrites the same artifact with bit-identical
    values when it runs.  A corpus past ``max_rows`` refuses the
    pure-Python pass (RuntimeError — the registry degrades that one
    oracle to a rows-only check) instead of silently burning minutes
    of single-threaded hashing at registry-build time; at those scales
    the artifact comes from the Spark query, which the driver runs
    first."""
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return False
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    n_rows = pq.ParquetFile(src).metadata.num_rows
    if n_rows > max_rows:
        raise RuntimeError(
            f"banded-artifact pure-Python guard: {src} has {n_rows} rows "
            f"(> {max_rows}); run the Spark query first to materialize "
            f"{path}"
        )
    tbl = pq.read_table(src, columns=["doc_id", "text"])
    ids, bands_col, keys = [], [], []
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        for _id, band, key in banded_rows(did, text if text is not None else ""):
            ids.append(_id)
            bands_col.append(band)
            keys.append(key)
    out = pa.table(
        {
            "_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands_col, pa.int32()),
            "key": pa.array(keys, pa.string()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(out, os.path.join(path, "part-python-twin.parquet"))
    return True
