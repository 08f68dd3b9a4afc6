"""Sequence packing and mixture sampling: spans tile each shard's
token stream exactly, packing is stable under corpus growth within
untouched shards, mixture rates hit the target in expectation and are
monotone in the weights, and scrubbing redacts what it counts."""

from pyspark.sql import functions as F

from dump1090_postgis_spark.datapipe.packing import (
    mixture_sample,
    pack_sequences,
    uniform_hash,
)
from dump1090_postgis_spark.datapipe.text import (
    scrub_counts,
    scrub_text,
    tfidf_top_terms,
)


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, "w " * (5 + i % 13)) for i in range(n)], "doc_id long, text string"
    )


def test_pack_spans_tile_shard_stream(spark):
    out = pack_sequences(
        _docs(spark), F.lit(10), seq_len=16, n_shards=4
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        expect_begin = 0
        for r in rows:
            # contiguous, gap-free tiling in id order
            assert r.begin_tok == expect_begin
            assert r.end_tok == r.begin_tok + r.n_tokens
            assert r.seq_first == r.begin_tok // 16
            assert r.seq_last == (r.end_tok - 1) // 16
            expect_begin = r.end_tok


def test_pack_stable_when_other_shard_grows(spark):
    """Adding a doc only perturbs the shard it hashes into."""
    base = {r.doc_id: r for r in pack_sequences(
        _docs(spark, 30), F.lit(7), seq_len=32, n_shards=4).collect()}
    grown = {r.doc_id: r for r in pack_sequences(
        _docs(spark, 31), F.lit(7), seq_len=32, n_shards=4).collect()}
    new_shard = grown[30].shard
    untouched = [i for i in range(30) if base[i].shard != new_shard]
    assert untouched  # hash spread guarantees some other-shard docs
    for i in untouched:
        assert grown[i] == base[i]


def test_mixture_sample_rates_and_monotonicity(spark):
    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    lo = mixture_sample(docs, {"a": 0.5}, 100, id_col="doc_id")
    rows = lo.collect()
    # only source a survives; expectation 0.5*100 = 50 of 200 a-docs
    assert {r.source for r in rows} == {"a"}
    assert 25 <= len(rows) <= 75
    # doubling the weight only ADDS docs (deterministic hash threshold)
    hi_ids = {
        r.doc_id
        for r in mixture_sample(docs, {"a": 1.0}, 100, id_col="doc_id").collect()
    }
    assert {r.doc_id for r in rows} <= hi_ids
    # rate 1.0 caps: weight*target >= count keeps everything
    allr = mixture_sample(docs, {"a": 1.0, "b": 1.0}, 1000, id_col="doc_id")
    assert allr.count() == 400


def test_uniform_hash_range_and_determinism(spark):
    df = spark.range(1000).select(
        uniform_hash(F.col("id")).alias("u")
    )
    mn, mx, avg = df.select(
        F.min("u"), F.max("u"), F.avg("u")
    ).first()
    assert 0.0 <= mn and mx < 1.0 and 0.3 < avg < 0.7
    again = spark.range(1000).select(uniform_hash(F.col("id")).alias("u"))
    assert df.exceptAll(again).count() == 0


def test_scrub_redacts_what_it_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@corp.io and https://x.io/a?b=c from 10.1.2.3 ok"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    counts = scrub_counts(F.col("text"))
    out = df.select(
        "doc_id",
        *[c.alias(k) for k, c in counts.items()],
        scrub_text(F.col("text")).alias("red"),
    ).collect()
    r1 = next(r for r in out if r.doc_id == 1)
    assert (r1.n_email, r1.n_url, r1.n_ipv4) == (1, 1, 1)
    assert r1.red == "mail <EMAIL> and <URL> from <IP> ok"
    r2 = next(r for r in out if r.doc_id == 2)
    assert (r2.n_email, r2.n_url, r2.n_ipv4) == (0, 0, 0)
    assert r2.red == "nothing here"


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [
            (1, "shared shared rare"),
            (2, "shared common"),
            (3, "shared common"),
        ],
        "doc_id long, text string",
    )
    top = {
        r.doc_id: r.term
        for r in tfidf_top_terms(df, top_n=1).collect()
    }
    # 'rare' appears in one doc -> highest idf for doc 1 despite tf tie
    assert top[1] == "rare"


def test_pack_extra_keys_isolate_streams(spark):
    """extra_keys partition the token stream: each (split, shard)
    group tiles from offset 0 independently."""
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        "doc_id long, split string",
    )
    out = pack_sequences(
        df, F.lit(5), seq_len=8, n_shards=2, extra_keys=["split"]
    ).collect()
    streams: dict[tuple, list] = {}
    for r in out:
        streams.setdefault((r.split, r.shard), []).append(r)
    assert len(streams) > 2  # both splits actually sharded
    for rows in streams.values():
        rows.sort(key=lambda r: r.doc_id)
        assert rows[0].begin_tok == 0  # every stream starts at zero
        for a, b in zip(rows, rows[1:]):
            assert b.begin_tok == a.end_tok


def test_packing_efficiency_accounting(spark):
    """Known layout: one shard, 3 docs x 5 tokens = 15 tokens at
    seq_len 8 -> 2 sequences, 1 padding token, efficiency 15/16."""
    from dump1090_postgis_spark.datapipe.packing import (
        pack_sequences,
        packing_efficiency,
    )

    df = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    packed = pack_sequences(df, F.lit(5), seq_len=8, n_shards=1)
    [row] = packing_efficiency(packed, seq_len=8).collect()
    assert row.n_docs == 3
    assert row.total_tokens == 15
    assert row.n_seqs == 2
    assert row.padded_tokens == 1
    assert abs(row.efficiency - 15 / 16) < 1e-9


def test_deterministic_shuffle_is_reproducible_permutation(spark):
    from dump1090_postgis_spark.datapipe.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(97)], "doc_id long")
    out = deterministic_shuffle(df, "doc_id", n_shards=4, seed="s1").collect()
    assert sorted(r.pos for r in out) == list(range(97))
    assert all(r.shard == r.pos % 4 for r in out)
    # input order must not matter (hash order is the only order)
    flipped = deterministic_shuffle(
        df.orderBy(F.desc("doc_id")), "doc_id", n_shards=4, seed="s1"
    ).collect()
    assert {(r.doc_id, r.pos) for r in flipped} == {(r.doc_id, r.pos) for r in out}
    # a different seed is a different permutation
    other = deterministic_shuffle(df, "doc_id", n_shards=4, seed="s2").collect()
    assert {(r.doc_id, r.pos) for r in other} != {(r.doc_id, r.pos) for r in out}


def test_apply_vocab_oov_counts(spark):
    from dump1090_postgis_spark.datapipe.text import apply_vocab

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "dog dog zebra"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("the",), ("cat",), ("dog",)], "token string")
    rows = {r.doc_id: r for r in apply_vocab(docs, vocab).collect()}
    assert rows[1].n_tokens == 3 and rows[1].n_oov == 1  # 'sat'
    assert rows[2].n_tokens == 3 and rows[2].n_oov == 1  # 'zebra'
    assert abs(rows[2].oov_rate - round(1 / 3, 4)) < 1e-9
    assert 3 not in rows  # no tokens -> absent, matching the oracle


def test_packing_efficiency_respects_stream_keys(spark):
    """With extra_keys, offsets restart per (split, shard) stream —
    efficiency must be accounted per stream, not per shard."""
    from dump1090_postgis_spark.datapipe.packing import (
        pack_sequences,
        packing_efficiency,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(6)],
        "doc_id long, split string",
    )
    packed = pack_sequences(df, F.lit(5), seq_len=8, n_shards=1, extra_keys=["split"])
    rows = packing_efficiency(packed, seq_len=8, stream_cols=("split", "shard")).collect()
    assert len(rows) == 2  # one row per (split, shard) stream
    for r in rows:
        assert r.total_tokens == 15  # 3 docs x 5 tokens per stream
        assert r.n_seqs == 2 and r.padded_tokens == 1


def test_packing_efficiency_zero_token_stream(spark):
    """A stream whose docs ALL tokenize to zero tokens fills zero
    sequences: capacity 0 → efficiency is NULL (try_divide), never a
    divide-by-zero error, and the count columns stay exact zeros."""
    from dump1090_postgis_spark.datapipe.packing import (
        pack_sequences,
        packing_efficiency,
    )

    df = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    packed = pack_sequences(df, F.lit(0), seq_len=8, n_shards=1)
    [row] = packing_efficiency(packed, seq_len=8).collect()
    assert row.n_docs == 3
    assert row.total_tokens == 0
    assert row.n_seqs == 0
    assert row.padded_tokens == 0
    assert row.efficiency is None


def test_pow2_bucket_boundaries(spark):
    from dump1090_postgis_spark.datapipe.packing import pow2_bucket

    cases = [(0, 16), (1, 16), (16, 16), (17, 32), (31, 32), (32, 32),
             (33, 64), (64, 64), (65, 128), (511, 512), (512, 512),
             (513, 512), (100000, 512)]
    df = spark.createDataFrame([(n,) for n, _ in cases], "n long")
    got = {r.n: r.b for r in df.select(
        "n", pow2_bucket(F.col("n"), 16, 512).alias("b")).collect()}
    for n, want in cases:
        assert got[n] == want, (n, got[n], want)


def test_length_bucket_batches_invariants(spark):
    """Each batch stays inside its token budget (capacity docs of
    bucket length = seq_len), batch indices are dense from 0 per
    (shard, bucket), and pad = bucket - effective length."""
    from dump1090_postgis_spark.datapipe.packing import length_bucket_batches

    docs = spark.createDataFrame(
        [(i, 3 + (i * 37) % 700) for i in range(300)], "doc_id long, n long"
    )
    out = length_bucket_batches(
        docs, F.col("n"), seq_len=256, n_shards=4, min_bucket=8
    ).collect()
    assert len(out) == 300
    groups: dict = {}
    for r in out:
        assert r.bucket <= 256 and r.bucket >= 8
        assert r.pad == r.bucket - min(r.n_tokens, 256)
        groups.setdefault((r.shard, r.bucket), []).append(r)
    for (shard, bucket), rows in groups.items():
        cap = max(1, 256 // bucket)
        idxs = sorted(r.batch_idx for r in rows)
        # dense from zero, never more than cap docs per batch
        from collections import Counter

        counts = Counter(idxs)
        assert min(counts) == 0
        assert max(counts.values()) <= cap
        # every batch except the last is exactly full
        for b in range(max(idxs)):
            assert counts[b] == cap


def test_pack_zero_token_doc_has_ordered_seq_range(spark):
    """A zero-token doc must not emit seq_last < seq_first (including
    seq_last = -1 at stream start): range-expanding consumers crash or
    invert on it."""
    from dump1090_postgis_spark.datapipe.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 0), (2, 512), (3, 0)], "doc_id long, n int"
    )
    out = {r.doc_id: r for r in
           pack_sequences(df, F.col("n"), seq_len=512, n_shards=1).collect()}
    for r in out.values():
        assert r.seq_last >= r.seq_first, r
    assert out[1].seq_first == out[1].seq_last  # empty doc: its position seq


def test_length_bucket_capacity_is_floor_of_budget(spark):
    """seq_len=768 with a 512-token bucket holds ONE doc per batch
    (768//512), not floor(rn/1.5) = two 512-padded docs = 1024 tokens
    in a 768-token budget."""
    from dump1090_postgis_spark.datapipe.packing import length_bucket_batches

    df = spark.createDataFrame(
        [(i, 400) for i in range(6)], "doc_id long, n int"
    )
    out = length_bucket_batches(
        df, F.col("n"), seq_len=768, n_shards=1, min_bucket=16
    ).collect()
    assert all(r.bucket == 512 for r in out)
    per_batch = {}
    for r in out:
        per_batch.setdefault(r.batch_idx, 0)
        per_batch[r.batch_idx] += 1
    assert set(per_batch.values()) == {1}  # one 512-bucket doc per 768 budget


def test_temperature_weights_zero_token_source_survives_ansi(spark):
    """A source whose token counts sum to 0 must yield NULL
    epochs/keep_rate, not an ANSI DIVIDE_BY_ZERO abort."""
    from dump1090_postgis_spark.datapipe.packing import temperature_weights

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 0), ("b", 0)], "source string, n int"
    )
    rows = {r.source: r for r in
            temperature_weights(
                df, tokens=F.col("n"), budget_tokens=100
            ).collect()}
    assert rows["b"].epochs is None and rows["b"].keep_rate is None
    assert rows["a"].epochs is not None
