"""Unit tests for datapipe/retrieval.py (inverted postings + BM25)."""

from __future__ import annotations

import math

from dump1090_postgis_spark.datapipe.retrieval import bm25_topk, inverted_postings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_postings_stats(spark):
    df = _docs(
        spark,
        [
            (1, "spark joins data"),
            (2, "spark spark streams"),
            (3, "data quality"),
        ],
    )
    got = {r.token: r for r in inverted_postings(df, top_n=10).collect()}
    assert (got["spark"].df_docs, got["spark"].cf) == (2, 3)
    assert (got["spark"].min_doc, got["spark"].max_doc) == (1, 2)
    assert (got["data"].df_docs, got["data"].cf) == (2, 2)
    assert got["quality"].df_docs == 1


def test_inverted_postings_top_n_cut_by_df_then_token(spark):
    df = _docs(spark, [(1, "a b"), (2, "a c"), (3, "a b")])
    out = inverted_postings(df, top_n=2).collect()
    assert [r.token for r in out] == ["a", "b"]  # df 3, then df 2 ('b' < 'c')


def test_bm25_ranks_higher_tf_first(spark):
    df = _docs(
        spark,
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
    )
    out = bm25_topk(df, ["spark"], top_n=10).collect()
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 never matches
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    assert out[0].score_micros > out[1].score_micros > 0


def test_bm25_matches_reference_formula(spark):
    """Cross-check one score against an independent Python evaluation
    of the documented rational-idf BM25."""
    texts = {1: "spark joins data data", 2: "data pipeline", 3: "other words here"}
    df = _docs(spark, list(texts.items()))
    k1, b = 1.2, 0.75
    out = {r.doc_id: r.score_micros for r in bm25_topk(df, ["data"], k1=k1, b=b).collect()}

    dls = {d: len(t.split()) for d, t in texts.items()}
    avgdl = sum(dls.values()) / len(dls)
    n, df_t = len(texts), 2
    idf = (n - df_t + 0.5) / (df_t + 0.5)

    def score(tf, dl):
        tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return int(round(idf * tfn * 1e6))

    assert out == {1: score(2, 4), 2: score(1, 2)}


def test_bm25_multi_term_sums_contributions(spark):
    df = _docs(spark, [(1, "x y"), (2, "x z"), (3, "z z")])
    one = {r.doc_id: r.score_micros for r in bm25_topk(df, ["x"]).collect()}
    two = {r.doc_id: r.score_micros for r in bm25_topk(df, ["x", "y"]).collect()}
    assert two[1] > one[1]  # doc 1 gains the 'y' contribution
    assert two[2] == one[2]  # doc 2 has no 'y'


def test_rerank_coverage_reorders_bm25(spark):
    """A doc hitting MORE distinct query terms must outrank one with a
    higher BM25 score from repeating a single term."""
    from dump1090_postgis_spark.datapipe.retrieval import rerank_topk

    df = _docs(
        spark,
        [
            (1, "x x x x filler"),          # high bm25 on 'x', 1 term
            (2, "x y filler filler filler"),  # lower bm25, 2 terms
            (3, "filler only here"),
        ],
    )
    out = rerank_topk(df, ["x", "y"], k_retrieve=10, k_final=10).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.doc_id for r in ranked] == [2, 1]
    assert ranked[0].n_query_terms == 2 and ranked[1].n_query_terms == 1


def test_rerank_model_seam_scores_candidates_only(spark):
    """An injected cross-encoder (pandas batch callable) replaces the
    coverage score; non-candidates never reach the output, and a model
    that rejects non-candidate text proves it only saw candidates."""

    def fake_model(texts):
        # hard-fail if the expensive model is ever handed a
        # non-candidate document (doc 3 has no query-term hits)
        if texts.str.contains("no hits").any():
            raise AssertionError("model saw a non-candidate text")
        return texts.str.len().astype("float64") * -1.0  # prefer SHORT docs

    from dump1090_postgis_spark.datapipe.retrieval import rerank_topk

    df = _docs(
        spark,
        [(1, "x " * 30), (2, "x y"), (3, "no hits at all")],
    )
    out = rerank_topk(df, ["x"], k_retrieve=10, k_final=10, model=fake_model)
    ranked = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.doc_id for r in ranked] == [2, 1]  # short candidate first


def test_bm25_duplicate_query_tokens_dedupe(spark):
    """A repeated query term must not double its contribution (the
    SQL (doc, token) GROUP BY formulation dedups implicitly)."""
    df = _docs(spark, [(1, "x y"), (2, "y z")])
    once = {r.doc_id: r.score_micros for r in bm25_topk(df, ["x"]).collect()}
    twice = {r.doc_id: r.score_micros for r in bm25_topk(df, ["x", "x"]).collect()}
    assert once == twice


def test_bm25_normalizes_query_tokens(spark):
    """The corpus side matches normalize_text'd (lowercased) words —
    an uppercase query term previously contributed zero silently."""
    from dump1090_postgis_spark.datapipe.retrieval import bm25_topk

    df = _docs(
        spark,
        [(1, "Spark joins data"), (2, "spark streams"), (3, "other prose")],
    )
    lower = bm25_topk(df, ["spark"], top_n=5).collect()
    upper = bm25_topk(df, ["  Spark "], top_n=5).collect()
    assert [tuple(r) for r in lower] == [tuple(r) for r in upper]
    assert lower  # the term does occur in the fixture corpus


def test_retrieval_supports_string_doc_ids(spark):
    """inverted_postings / bm25_topk / rerank_topk on a string-keyed
    corpus: ids must pass through untouched instead of being cast to
    bigint (NULL keys under ANSI-off, a runtime error under ANSI)."""
    from dump1090_postgis_spark.datapipe.retrieval import (
        bm25_topk,
        inverted_postings,
        rerank_topk,
    )

    df = spark.createDataFrame(
        [("doc-a", "spark joins data fast"),
         ("doc-b", "spark shuffles data across executors"),
         ("doc-c", "completely unrelated prose")],
        "doc_id string, text string",
    )
    posts = {r.token: (r.min_doc, r.max_doc)
             for r in inverted_postings(df, top_n=50).collect()}
    assert posts["spark"] == ("doc-a", "doc-b")
    top = bm25_topk(df, ["spark"], top_n=3).collect()
    assert {r.doc_id for r in top} == {"doc-a", "doc-b"}
    assert all(r.doc_id is not None for r in top)
    rr = rerank_topk(df, ["spark", "data"], k_retrieve=3, k_final=2).collect()
    assert all(r.doc_id in {"doc-a", "doc-b"} for r in rr)
