"""Property-based tests (hypothesis): engine expressions vs independent
Python references on randomized inputs — formatting, sessionization,
geometry, and dense-id assignment hold their contracts on inputs no
hand-written fixture would cover.

Each example round-trips one small Spark job, so max_examples stays
low; the per-example DataFrames carry many generated rows, which is
where the case volume comes from.
"""

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=5, deadline=None)


# --- _fmt vs decimal reference ---------------------------------------------


def _py_fmt(x: float, decimals: int) -> str:
    q = Decimal(repr(x)).quantize(Decimal(1).scaleb(-decimals), ROUND_HALF_UP)
    s = f"{q:f}"
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return s


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_fmt_matches_decimal_half_up(spark, xs, decimals):
    from dump1090_postgis_spark.functions.geo import _fmt

    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r.s for r in df.select(_fmt(F.col("x"), decimals).alias("s")).collect()]
    want = [_py_fmt(x, decimals) for x in xs]
    assert got == want


# --- sessionize vs reference splitter --------------------------------------


def _py_sessions(ts_list, gap_s):
    out, sid, prev = [], -1, None
    for t in sorted(ts_list):
        if prev is None or t - prev > gap_s:
            sid += 1
        out.append((t, sid))
        prev = t
    return dict(out)


@settings(**SETTINGS)
@given(
    st.dictionaries(
        st.sampled_from(["A", "B", "C"]),
        st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=40, unique=True),
        min_size=1, max_size=3,
    ),
    st.integers(min_value=1, max_value=600),
)
def test_sessionize_matches_gap_reference(spark, data, gap_s):
    import datetime

    from dump1090_postgis_spark.operators.sessionize import sessionize

    epoch = datetime.datetime(2024, 1, 1)
    rows = [
        (k, epoch + datetime.timedelta(seconds=t))
        for k, ts in data.items() for t in ts
    ]
    df = spark.createDataFrame(rows, "hexident string, gen_date_time timestamp")
    got = {
        (r.hexident, int((r.gen_date_time - epoch).total_seconds())): r.session_id
        for r in sessionize(df, gap_s=gap_s).collect()
    }
    for k, ts in data.items():
        ref = _py_sessions(ts, gap_s)
        for t, sid in ref.items():
            assert got[(k, t)] == sid, (k, t, gap_s)


# --- point_in_polygon vs convex ground truth --------------------------------


@settings(**SETTINGS)
@given(
    st.integers(min_value=3, max_value=8),          # vertices
    st.floats(min_value=0.1, max_value=5.0),        # radius
    st.floats(min_value=0.0, max_value=2 * math.pi),  # rotation
    st.lists(
        st.tuples(st.floats(min_value=-6, max_value=6),
                  st.floats(min_value=-6, max_value=6)),
        min_size=1, max_size=30,
    ),
)
def test_point_in_convex_polygon(spark, n, radius, rot, points):
    """Ray casting must agree with the half-plane test on convex
    (regular, rotated) polygons for points not on the boundary."""
    from dump1090_postgis_spark.functions.geo import point_in_polygon

    verts = [
        (radius * math.cos(rot + 2 * math.pi * i / n),
         radius * math.sin(rot + 2 * math.pi * i / n))
        for i in range(n)
    ]

    def inside_convex(px, py):
        signs = []
        for i in range(n):
            ax, ay = verts[i]
            bx, by = verts[(i + 1) % n]
            signs.append((bx - ax) * (py - ay) - (by - ay) * (px - ax))
        if any(abs(s) < 1e-9 for s in signs):
            return None  # boundary-ish: implementation-defined, skip
        return all(s > 0 for s in signs) or all(s < 0 for s in signs)

    expected = [inside_convex(px, py) for px, py in points]
    rows = [
        (float(px), float(py)) for (px, py), e in zip(points, expected)
        if e is not None
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "px double, py double")
    poly = F.array(*[
        F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat")) for x, y in verts
    ])
    got = [
        r.inside
        for r in df.select(
            point_in_polygon(F.col("px"), F.col("py"), poly).alias("inside")
        ).collect()
    ]
    want = [e for e in expected if e is not None]
    assert got == want


# --- dense ids: input-order invariance --------------------------------------


@settings(**SETTINGS)
@given(st.permutations(list(range(60))))
def test_dense_ids_follow_total_order(spark, perm):
    from dump1090_postgis_spark.operators.ids import with_dense_ids

    df = spark.createDataFrame([(k,) for k in perm], "k long")
    out = {r.k: r.id for r in with_dense_ids(df, ["k"], "id").collect()}
    assert out == {k: k + 1 for k in range(60)}


# --- pack_sequences vs Python concat-and-chunk reference -------------------


def _py_pack(rows, seq_len, n_shards):
    """Independent reference: md5-shard, sort by id, running offsets."""
    import hashlib

    out = {}
    shards: dict[int, list] = {}
    for doc_id, toks in rows:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n_shards
        shards.setdefault(b, []).append((doc_id, toks))
    for shard, docs in shards.items():
        off = 0
        for doc_id, toks in sorted(docs):
            out[doc_id] = (
                shard, toks, off, off + toks,
                off // seq_len, (off + toks - 1) // seq_len,
            )
            off += toks
    return out


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=2_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([16, 128, 512]),
    st.sampled_from([1, 3, 8]),
)
def test_pack_sequences_matches_reference(spark, rows, seq_len, n_shards):
    from dump1090_postgis_spark.datapipe.packing import pack_sequences

    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r.doc_id: (
            r.shard, r.n_tokens, r.begin_tok, r.end_tok, r.seq_first, r.seq_last
        )
        for r in pack_sequences(
            df, F.col("n"), seq_len=seq_len, n_shards=n_shards
        ).collect()
    }
    assert got == _py_pack(rows, seq_len, n_shards)


# --- mixture_sample vs Python md5-threshold reference ----------------------


def _py_mixture(rows, weights, target):
    import hashlib
    from collections import Counter

    counts = Counter(src for _i, src in rows)
    kept = []
    for doc_id, src in rows:
        w = weights.get(src, 0.0)
        rate = round(min(1.0, w * float(target) / counts[src]), 9)
        u = (
            int(
                hashlib.md5((str(doc_id) + "mix").encode()).hexdigest()[:8], 16
            )
            / 4294967296.0
        )
        if u < rate:
            kept.append(doc_id)
    return sorted(kept)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    ),
    st.fixed_dictionaries(
        {},
        optional={
            "a": st.floats(0.0, 1.0, allow_nan=False),
            "b": st.floats(0.0, 1.0, allow_nan=False),
        },
    ),
    st.integers(min_value=0, max_value=500),
)
def test_mixture_sample_matches_reference(spark, rows, weights, target):
    from dump1090_postgis_spark.datapipe.packing import mixture_sample

    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r.doc_id
        for r in mixture_sample(df, weights, target, id_col="doc_id").collect()
    )
    assert got == _py_mixture(rows, weights, target)


# --- rank_quantile_threshold vs Python nearest-rank reference --------------


def _py_nearest_rank(values, q):
    import math

    s = sorted(values)
    return s[max(0, math.ceil(q * len(s)) - 1)]


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=80,
    ),
    st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
def test_rank_quantile_matches_reference(spark, rows, q):
    from dump1090_postgis_spark.datapipe.sampling import (
        rank_quantile_threshold,
    )

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k string, v double"
    )
    got = {
        r.k: r.threshold
        for r in rank_quantile_threshold(df, "v", q, ["k"]).collect()
    }
    expected = {}
    for k in {k for k, _ in rows}:
        expected[k] = float(_py_nearest_rank([v for kk, v in rows if kk == k], q))
    assert got == expected


# --- deterministic_shuffle vs Python md5-order reference -------------------


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=80, unique=True),
    st.integers(min_value=1, max_value=7),
)
def test_deterministic_shuffle_matches_md5_reference(spark, ids, n_shards):
    import hashlib

    from dump1090_postgis_spark.datapipe.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.pos, r.shard)
        for r in deterministic_shuffle(df, "doc_id", n_shards, seed="p").collect()
    }
    order = sorted(ids, key=lambda i: (hashlib.md5(f"p|{i}".encode()).hexdigest(), i))
    want = {i: (p, p % n_shards) for p, i in enumerate(order)}
    assert got == want


# --- apply_vocab vs Python token-count reference ---------------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=24),
        min_size=1, max_size=20,
    ),
    st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), max_size=3,
             unique=True),
)
def test_apply_vocab_matches_python_reference(spark, texts, vocab_tokens):
    import re

    from dump1090_postgis_spark.datapipe.text import apply_vocab

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [(t,) for t in vocab_tokens] or [("zz",)], "token string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in apply_vocab(docs, vocab).collect()
    }
    vset = set(vocab_tokens) if vocab_tokens else {"zz"}
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.sub(r"\s+", " ", t.lower().strip()).split(" ") if w]
        if toks:
            want[i] = (len(toks), sum(1 for w in toks if w not in vset))
    assert got == want


# --- label_outliers centroid math vs numpy reference -----------------------


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.lists(st.floats(min_value=-4, max_value=4,
                               allow_nan=False, width=32),
                     min_size=3, max_size=3),
        ),
        min_size=2, max_size=12,
    )
)
def test_label_outliers_matches_numpy_reference(spark, rows):
    import numpy as np

    from dump1090_postgis_spark.datapipe.similarity import label_outliers

    data = [(i, list(map(float, v)), lab) for i, (lab, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label string"
    )
    got = {r.vec_id: r.cosine_to_centroid
           for r in label_outliers(df, threshold=0.0).collect()}
    by_label: dict = {}
    for i, v, lab in data:
        by_label.setdefault(lab, []).append((i, np.array(v)))
    for lab, members in by_label.items():
        cen = np.mean([v for _i, v in members], axis=0)
        for i, v in members:
            denom = np.linalg.norm(v) * np.linalg.norm(cen)
            if denom == 0:
                assert got[i] is None
            else:
                want = round(float(np.dot(v, cen) / denom), 4)
                assert got[i] is not None and abs(got[i] - want) <= 1e-4, (i, got[i], want)


# --- funnel_steps vs Python fold reference ---------------------------------


def _py_funnel(events, steps):
    """Reference: per user, chase min ts per step where ts >= prev."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, ts, et in events:
        by_user[uid].append((ts, et))
    counts = [0] * len(steps)
    for rows in by_user.values():
        prev = None
        for i, step in enumerate(steps):
            cand = [t for t, e in rows if e == step and (prev is None or t >= prev)]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),      # user
            st.integers(min_value=0, max_value=50),     # second offset
            st.sampled_from(["view", "click", "buy", "other"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_funnel_matches_python_reference(spark, data):
    from datetime import datetime, timedelta

    from dump1090_postgis_spark.operators.analytics import funnel_steps

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, uid, t0 + timedelta(seconds=sec), et)
        for i, (uid, sec, et) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click", "buy"]
    got = {r.step_idx: r.n_users for r in funnel_steps(df, steps).collect()}
    events = [(uid, t0 + timedelta(seconds=sec), et) for uid, sec, et in data]
    want = _py_funnel(events, steps)
    assert [got[i + 1] for i in range(len(steps))] == want


# --- scd2_intervals vs Python run-compaction reference ---------------------


def _py_scd2(snaps):
    """Reference: per doc, sort by snapshot; split runs on hash change
    or snapshot gap; current = run ends at the global max snapshot."""
    from collections import defaultdict

    cur = max(s for s, _d, _h in snaps)
    by_doc = defaultdict(list)
    for s, d, h in snaps:
        by_doc[d].append((s, h))
    out = set()
    for d, rows in by_doc.items():
        rows.sort()
        runs = []
        for s, h in rows:
            if runs and runs[-1][2] == h and runs[-1][1] == s - 1:
                runs[-1][1] = s
                runs[-1][3] += 1
            else:
                runs.append([s, s, h, 1])
        for frm, to, h, n in runs:
            out.add((d, h, frm, to, n, to == cur))
    return out


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # snapshot
            st.integers(min_value=1, max_value=4),   # doc
            st.sampled_from(["x", "y"]),             # content hash
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),           # one row per (snap, doc)
    )
)
@settings(**SETTINGS)
def test_scd2_matches_python_reference(spark, data):
    from dump1090_postgis_spark.datapipe.scd import scd2_intervals

    df = spark.createDataFrame(
        data, "snapshot_id int, doc_id long, text_hash string"
    )
    got = {
        (r.doc_id, r.text_hash, r.from_snap, r.to_snap, r.n_snaps, r.is_current)
        for r in scd2_intervals(df).collect()
    }
    assert got == _py_scd2([(s, d, h) for s, d, h in data])


# --- SBS-1 parser fuzz: garbage in, no exceptions out ----------------------


@given(
    lines=st.lists(
        st.one_of(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\n\r"
                ),
                max_size=80,
            ),
            # comma-heavy garbage that passes the 22-field gate shape
            st.lists(
                st.text(alphabet="MSG0123456789ABCdef+-.:/ ", max_size=6),
                min_size=22,
                max_size=22,
            ).map(lambda fs: ",".join(fs)),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_parser_never_raises_on_garbage(spark, lines):
    """PRJ-2 NULL-on-fail parity under fuzz: any byte garbage either
    drops at a gate or lands as a typed row with NULLs — the ANSI-mode
    session must never throw from the parse path (both strict and
    lenient modes)."""
    from dump1090_postgis_spark.operators.parse import parse_sbs1_lines

    df = spark.createDataFrame([(l,) for l in lines], "value string")
    for validate in (True, False):
        out = parse_sbs1_lines(df, validate=validate).collect()
        # every surviving row came from a 22-field line
        assert len(out) <= sum(1 for l in lines if l.count(",") == 21)


# --- stratified exact split vs python reference (null strata included) ------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["web", "book", None]),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    frac=st.floats(min_value=0.05, max_value=0.9),
)
@settings(**SETTINGS)
def test_stratified_split_matches_reference_with_null_strata(spark, rows, frac):
    """Every stratum — INCLUDING a NULL stratum — gets exactly
    ceil(frac·n) holdout rows, nothing is dropped, and the holdout
    choice matches the seeded-md5-order Python reference."""
    import hashlib
    import math

    from dump1090_postgis_spark.datapipe.sampling import stratified_exact_split

    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_exact_split(df, ["source"], frac=frac, seed="42").collect()
    assert len(out) == len(rows)

    by = {}
    for did, src in rows:
        by.setdefault(src, []).append(did)
    expected_eval = set()
    for src, ids in by.items():
        k = math.ceil(len(ids) * frac)
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(f"42|{i}".encode()).hexdigest(), i)
        )
        expected_eval.update(ranked[:k])
    got_eval = {r.doc_id for r in out if r.split == "eval"}
    assert got_eval == expected_eval
