"""Property-based tests (hypothesis) for the dual-engine invariants.

The crafted-example equivalence tests in test_datapipe.py pin known
edge cases; these properties fuzz the same invariants over RANDOM
inputs — the class of bug they target is "the two engines agree on
every case we thought of, and disagree on one we didn't".  Each
hypothesis example batches all its rows into ONE Spark job (a
per-row job would be ~1000× slower), examples are derandomized so the
suite is reproducible, and example counts are kept small because each
example is a full Spark action.

Targets:
- the pure-Python banded-signature twin (`datapipe/lsh_artifact.py`,
  the minhash oracle's compute-if-missing guard) vs the Spark
  `minhash_banded` plan — normalize → shingle → seeded xxhash64
  chain → banded keys, bit-identical on arbitrary text;
- `bucketed_jaccard_pairs` (C-set verify, the ≥100k-doc fast path) vs
  `banded_candidate_pairs + jaccard_pairs` (the oracle join engine);
- `embedding_near_dup_pairs(engine='vectorized')` (numpy bucket
  matmul, the ≥50k-row fast path) vs `engine='join'`.
"""

import math

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dump1090_postgis_spark.datapipe import dedup as dd
from dump1090_postgis_spark.datapipe import lsh_artifact as la

# Controlled alphabet: ASCII words + multi-byte UTF-8 (2/3-byte
# sequences hit xxh64_bytes' 4-byte and tail lanes) + the Java-\s
# whitespace run the normalizer collapses.  Deliberately excludes
# locale-sensitive case-mapping landmines (İ, ß-variants) — casefold
# parity on those is not the twin's contract; byte-level hash/shingle
# structure is.
_CHARS = st.sampled_from(list("abcdefgh XYZ012\t\n\r") + ["é", "ö", "中", "日"])
_TEXT = st.text(alphabet=_CHARS, min_size=0, max_size=120)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(texts=st.lists(_TEXT, min_size=1, max_size=12))
def test_python_banded_twin_matches_spark_on_random_text(spark, texts):
    # Long strings (>=32 utf-8 bytes) exercise the xxHash64 v1..v4
    # block loop; guarantee at least one per example.
    texts = texts + ["the quick brown fox jumps over the lazy dog once more"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spark_rows = {
        (r._id, r.band, r.key)
        for r in dd.minhash_banded(docs, hash_family="xxhash64").collect()
    }
    py_rows = set()
    for i, t in enumerate(texts):
        py_rows.update(la.banded_rows(i, t))
    assert py_rows == spark_rows


# Small word pool so random docs overlap: exact dups, near-dups and
# disjoint docs all arise without hand-crafting.
_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
_DOC = st.one_of(
    st.none(),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(" ".join),
)


@settings(**_SETTINGS)
@given(
    docs=st.lists(_DOC, min_size=2, max_size=14),
    cap=st.sampled_from([None, 4]),
    threshold=st.sampled_from([0.0, 0.5]),
)
def test_jaccard_engines_agree_on_random_corpora(spark, docs, cap, threshold):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    banded = dd.minhash_banded(df, hash_family="xxhash64")
    join_out = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.jaccard_pairs(
            df,
            dd.banded_candidate_pairs(banded, max_bucket_size=cap),
            threshold=threshold,
        ).collect()
    }
    bucketed = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.bucketed_jaccard_pairs(
            df, banded, threshold=threshold, max_bucket_size=cap
        ).collect()
    }
    assert bucketed == join_out


# Discrete component levels make random vectors collide into LSH
# buckets (and produce exact dups) far more often than gaussians
# would; NaN is a legal level (nanSafeCompare emission is part of the
# contract).  All-zero vectors are kept — both engines must agree on
# 0/0 cosines too.
_LEVEL = st.sampled_from([-1.0, 0.0, 0.5, 1.0, float("nan")])
_VEC = st.lists(_LEVEL, min_size=8, max_size=8)


@settings(**_SETTINGS)
@given(
    vecs=st.lists(_VEC, min_size=2, max_size=14),
    cap=st.sampled_from([None, 4]),
)
def test_embedding_engines_agree_on_random_vectors(spark, vecs, cap):
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )

    def norm(out):
        return {
            (r.id_a, r.id_b, "nan" if math.isnan(r.cosine) else round(r.cosine, 4))
            for r in out.collect()
        }

    j = norm(
        dd.embedding_near_dup_pairs(
            df, threshold=0.9, dim=8, max_bucket_size=cap, engine="join"
        )
    )
    v = norm(
        dd.embedding_near_dup_pairs(
            df, threshold=0.9, dim=8, max_bucket_size=cap, engine="vectorized"
        )
    )
    assert v == j
