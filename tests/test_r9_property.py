"""Hypothesis property suites for the round-9 operators, each against a
pure-Python reference: bigram sequence log-likelihood vs a dict-walk
Markov model (duplicate timestamps, null labels, single-event keys), and
the hashed-ngram linear quality classifier vs a direct replica. Tiny
alphabets maximize collisions — the adversarial shapes."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F  # noqa: F401


def _ref_sequence_loglik(rows):
    """rows: (key, minute, tie, label). Add-1-smoothed bigram LL in
    micro-nats, per-transition rounding before the per-key sum."""
    from collections import defaultdict

    per = defaultdict(list)
    for k, m, tie, lab in rows:
        per[k].append((m, tie, lab))
    pairs = []
    for k, seq in per.items():
        seq.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs.append((k, a, b))
    m_cnt: dict = defaultdict(int)
    tot: dict = defaultdict(int)
    for _, a, b in pairs:
        m_cnt[(a, b)] += 1
        tot[a] += 1
    alphabet = {lab for *_, lab in rows}
    v = len(alphabet)
    out: dict = defaultdict(lambda: [0, 0])
    for k, a, b in pairs:
        lp = round(math.log((m_cnt[(a, b)] + 1) / (tot[a] + v)) * 1_000_000)
        out[k][0] += 1
        out[k][1] += lp
    return {k: tuple(x) for k, x in out.items()}


@pytest.mark.slow
def test_sequence_loglik_property(spark):
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.temporal import sequence_loglik

    t0 = dt.datetime(2026, 1, 1)
    row = st.tuples(
        st.integers(0, 2),                                    # key
        st.integers(0, 3),                                    # minute (dups)
        st.integers(0, 100),                                  # tiebreak
        st.one_of(st.none(), st.sampled_from(["a", "b"])),    # label
    )
    # unique (key, minute, tie) so the total order is unambiguous
    batch = st.lists(row, min_size=1, max_size=14, unique_by=lambda r: r[:3])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=batch)
    def check(rows):
        df = spark.createDataFrame(
            [(k, t0 + dt.timedelta(minutes=m), tie, lab) for k, m, tie, lab in rows],
            "k long, ts timestamp, eid long, lab string",
        )
        got = {
            r.key: (r.n_trans, r.loglik_u)
            for r in sequence_loglik(df, "k", "ts", "lab", "eid").collect()
        }
        assert got == _ref_sequence_loglik(rows), rows

    check()


def test_sequence_loglik_external_matrix_and_validation(spark):
    """External-matrix path: scoring a batch against a FROZEN corpus
    model must use the corpus totals and the caller's alphabet size,
    and transitions absent from the matrix smooth to 1/(tot+V)."""
    from cassandra_diff_spark.operators.temporal import (
        sequence_loglik,
        transition_matrix,
    )

    t0 = dt.datetime(2026, 1, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    corpus = spark.createDataFrame(
        [
            (1, mk(0), 1, "a"), (1, mk(1), 2, "b"),
            (2, mk(0), 3, "a"), (2, mk(1), 4, "b"), (2, mk(2), 5, "c"),
        ],
        "k long, ts timestamp, eid long, lab string",
    )
    tm = transition_matrix(corpus, "k", "ts", "lab", "eid", ppm=False)
    # batch: one seen hop (a->b: n=2, tot_a=2 -> ln(3/6)) and one hop
    # absent from the matrix (b->z: n=0, tot_b=1 -> ln(1/5))
    batch = spark.createDataFrame(
        [(9, mk(0), 1, "a"), (9, mk(1), 2, "b"), (9, mk(2), 3, "z")],
        "k long, ts timestamp, eid long, lab string",
    )
    got = {
        r.key: (r.n_trans, r.loglik_u)
        for r in sequence_loglik(
            batch, "k", "ts", "lab", "eid", matrix=tm, alphabet_size=4
        ).collect()
    }
    want = round(math.log(3 / 6) * 1e6) + round(math.log(1 / 5) * 1e6)
    assert got == {9: (2, want)}

    with pytest.raises(ValueError, match="alphabet_size"):
        sequence_loglik(batch, "k", "ts", "lab", "eid", matrix=tm)


def _ref_classifier(docs, model, d, bias_u, threshold_u):
    import hashlib

    def md5h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    out = {}
    for i, t in docs:
        toks = [x for x in t.strip().split() if x] if t is not None else []
        feats = toks + [a + "\x1f" + b for a, b in zip(toks, toks[1:])]
        logit = bias_u + sum(model.get(md5h(f) % d, 0) for f in feats)
        out[i] = (
            len(feats),
            logit,
            len(feats) > 0 and logit >= threshold_u * len(feats),
        )
    return out


@pytest.mark.slow
def test_classifier_score_property(spark):
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.curate import classifier_score

    d = 16  # tiny bucket table -> guaranteed hash collisions
    word = st.text(alphabet="abc", min_size=1, max_size=3)
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    corpus = st.lists(st.one_of(st.none(), doc), min_size=1, max_size=6)
    weights = st.lists(
        st.integers(-1000, 1000), min_size=d, max_size=d
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=corpus, ws=weights)
    def check(texts, ws):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        model = spark.createDataFrame(
            list(enumerate(ws)), "bucket long, weight_u long"
        )
        got = {
            r.id: (r.n_features, r.logit_u, r.pred)
            for r in classifier_score(
                df, "doc_id", "text", model,
                n_buckets=d, bias_u=7, threshold_u=-50,
            ).collect()
        }
        assert got == _ref_classifier(docs, dict(enumerate(ws)), d, 7, -50)

    check()


def test_classifier_score_map_only_plan(spark):
    """The scorer's plan must be map-only over the corpus: the model
    arrives via broadcast (nested-loop crossJoin of a 1-row map frame)
    and there is NO Exchange over the document side — the shape that
    survives 100 TB."""
    from cassandra_diff_spark.operators.curate import classifier_score

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    model = spark.range(32).select(
        F.col("id").alias("bucket"), (F.col("id") * 3 - 40).alias("weight_u")
    )
    scored = classifier_score(df, "doc_id", "text", model, n_buckets=32)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the only allowed exchange is the broadcast of the 1-row model map
    import re

    data_exchanges = [
        ln for ln in plan.splitlines()
        if re.search(r"\bExchange (hash|range|rebalance)", ln)
    ]
    assert not data_exchanges, plan
