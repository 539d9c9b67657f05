"""Property-based testing of the evaluation operators: random pair
sets, rankings, and label columns are scored by the engine and by
pure-Python reference implementations. Any divergence on any generated
input is a semantics bug; hypothesis shrinks failures to minimal
counterexamples.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pair = st.tuples(
    st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
)
pair_set = st.lists(pair, min_size=0, max_size=15)

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _round_half_up(x: float) -> int:
    """Reference rounding matching Spark/DuckDB ROUND: half AWAY from zero.
    Python's built-in ``round()`` is banker's (half-even), which diverges on
    exact-.5 ties that hypothesis readily finds (e.g. pe = 414062.5)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _canon(pairs):
    return {
        (min(a, b), max(a, b)) for a, b in pairs if a != b
    }


@settings(**_SETTINGS)
@given(pred=pair_set, truth=pair_set)
def test_pair_metrics_matches_set_reference(spark, pred, truth):
    from cassandra_diff_spark.operators.evaluate import pair_metrics

    schema = "id_1 long, id_2 long"
    p = spark.createDataFrame(pred, schema) if pred else spark.createDataFrame([], schema)
    t = spark.createDataFrame(truth, schema) if truth else spark.createDataFrame([], schema)
    r = pair_metrics(p, t).collect()[0]
    cp, ct = _canon(pred), _canon(truth)
    tp, fp, fn = len(cp & ct), len(cp - ct), len(ct - cp)
    assert (r.tp, r.fp, r.fn) == (tp, fp, fn), (pred, truth)
    assert r.precision_milli == ((1000 * tp) // len(cp) if cp else None)
    assert r.recall_milli == ((1000 * tp) // len(ct) if ct else None)
    denom = 2 * tp + fp + fn
    assert r.f1_milli == ((2000 * tp) // denom if denom else None)


ranking = st.lists(
    st.integers(min_value=0, max_value=9), min_size=0, max_size=8, unique=True
)
relevant = st.sets(st.integers(min_value=0, max_value=9), min_size=0, max_size=6)


@settings(**_SETTINGS)
@given(ranked=ranking, rel=relevant, k=st.integers(min_value=1, max_value=8))
def test_single_query_retrieval_reference(spark, ranked, rel, k):
    from cassandra_diff_spark.operators.evaluate import (
        average_precision_at_k,
        retrieval_metrics,
    )

    pred_rows = [(1, n, i + 1) for i, n in enumerate(ranked)]
    truth_rows = [(1, n) for n in sorted(rel)]
    ps, ts = "query_id long, neighbor_id long, rank long", "query_id long, neighbor_id long"
    pred = spark.createDataFrame(pred_rows, ps) if pred_rows else spark.createDataFrame([], ps)
    truth = spark.createDataFrame(truth_rows, ts) if truth_rows else spark.createDataFrame([], ts)

    hits = [i + 1 for i, n in enumerate(ranked[:k]) if n in rel]
    if not rel:
        # global agg: one summary row with zero queries + NULL metrics;
        # the per-query AP frame is empty
        r0 = retrieval_metrics(pred, truth, k=k).collect()[0]
        assert r0.n_queries == 0 and r0.micro_recall_milli is None
        assert average_precision_at_k(pred, truth, k=k).count() == 0
        return
    r = retrieval_metrics(pred, truth, k=k).collect()[0]
    assert r.n_queries == 1 and r.sum_relevant == len(rel)
    assert r.sum_hits == len(hits)
    assert r.micro_recall_milli == (1000 * len(hits)) // len(rel)
    assert r.mrr_micro == (1000000 // hits[0] if hits else 0)

    ap = average_precision_at_k(pred, truth, k=k).collect()[0]
    want = sum((1000000 * (i + 1)) // rank for i, rank in enumerate(hits))
    want //= min(len(rel), k)
    assert ap.ap_micro == want, (ranked, sorted(rel), k)


labels = st.lists(
    st.tuples(
        st.sampled_from(["x", "y", "z", None]),
        st.sampled_from(["x", "y", "z", None]),
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(rows=labels)
def test_kappa_matches_reference(spark, rows):
    from cassandra_diff_spark.operators.evaluate import cohen_kappa

    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    n = len(rows)
    agree = sum(1 for a, b in rows if a == b)
    ca: dict = {}
    cb: dict = {}
    for a, b in rows:
        ca[a] = ca.get(a, 0) + 1
        cb[b] = cb.get(b, 0) + 1
    s = sum(ca.get(l, 0) * cb.get(l, 0) for l in set(ca) | set(cb))
    assert (r.n_items, r.n_agree) == (n, agree), rows
    assert r.po_milli == (1000 * agree) // n
    assert r.pe_micro == _round_half_up(s / (n * n) * 1e6)
    if n * n - s == 0:
        assert r.kappa_micro is None
    else:
        assert r.kappa_micro == _round_half_up((agree * n - s) / (n * n - s) * 1e6)
        assert r.kappa_micro <= 1_000_000


def test_kappa_exact_half_tie(spark):
    """Deterministic exact-.5 tie: n=16, s=2 → pe = 2/256·1e6 = 7812.5.
    HALF_UP (operator, DuckDB) gives 7813; Python banker's round() would
    give 7812 — the r6 hypothesis-found test-oracle bug, pinned forever."""
    from cassandra_diff_spark.operators.evaluate import cohen_kappa

    rows = [("x", "z"), ("z", "x")] + [("y", "w")] * 14
    r = cohen_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert (r.n_items, r.n_agree) == (16, 0)
    assert r.pe_micro == 7813
    assert r.kappa_micro == _round_half_up(-2 / 254 * 1e6) == -7874


votes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["a", "b", None]),
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(rows=votes)
def test_majority_label_matches_reference(spark, rows):
    from collections import Counter

    from cassandra_diff_spark.operators.evaluate import majority_label

    df = spark.createDataFrame(rows, "item long, label string")
    got = {r.item: r for r in majority_label(df, "item", "label").collect()}
    by_item: dict = {}
    for item, lab in rows:
        by_item.setdefault(item, []).append(lab)
    for item, labs in by_item.items():
        c = Counter(labs)
        # count DESC, then non-null before null, then label ASC
        winner = min(
            c.items(), key=lambda kv: (-kv[1], kv[0] is None, kv[0] or "")
        )
        r = got[item]
        assert (r.label, r.n_votes, r.n_total) == (
            winner[0], winner[1], len(labs),
        ), rows
        assert r.agreement_milli == (1000 * winner[1]) // len(labs)
