"""Hypothesis property suites for the round-8 operators, each against a
pure-Python reference: prefix-filter exact Jaccard (word mode) vs brute
force, the Markov transition matrix vs a dict-walk, and halving-bucket
decayed counts vs direct integer arithmetic. Tiny alphabets maximize
collisions — duplicate tokens, duplicate timestamps, null labels are the
adversarial shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import functions as F  # noqa: F401


def _ref_prefix_jaccard(texts, num, den):
    sets = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        toks = {w for w in t.strip().split() if w}
        if toks:
            sets[i] = toks
    out = {}
    ids = sorted(sets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter * den >= num * union:
                out[(i, j)] = (inter, union, inter * 1_000_000 // union)
    return out


@pytest.mark.slow
def test_prefix_jaccard_property(spark):
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.dedup import prefix_jaccard_pairs

    word = st.text(alphabet="xyz", min_size=1, max_size=2)
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
    corpus = st.lists(st.one_of(st.none(), doc), min_size=2, max_size=6)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=corpus)
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            (r.id_1, r.id_2): (r.intersect_n, r.union_n, r.jaccard_ppm)
            for r in prefix_jaccard_pairs(
                df, "doc_id", "text", threshold_num=1, threshold_den=2
            ).collect()
        }
        assert got == _ref_prefix_jaccard(texts, 1, 2), texts

    check()


def _ref_transitions(rows):
    """rows: (key, minute, tie, label). Reference bigram counts + ppm."""
    from collections import defaultdict

    per_key = defaultdict(list)
    for k, m, tie, lab in rows:
        per_key[k].append((m, tie, lab))
    counts: dict = {}
    for seq in per_key.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot: dict = {}
    for (a, _b), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    return {
        (a, b): (n, n * 1_000_000 // row_tot[a])
        for (a, b), n in counts.items()
    }


@pytest.mark.slow
def test_transition_matrix_property(spark):
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.temporal import transition_matrix

    t0 = dt.datetime(2026, 1, 1)
    row = st.tuples(
        st.integers(0, 2),               # key
        st.integers(0, 3),               # minute (duplicates likely)
        st.integers(0, 100),             # tiebreak
        st.one_of(st.none(), st.sampled_from(["a", "b"])),
    )
    rows = st.lists(row, min_size=1, max_size=12, unique_by=lambda r: (r[0], r[2]))

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rs=rows)
    def check(rs):
        df = spark.createDataFrame(
            [(k, t0 + dt.timedelta(minutes=m), tie, lab) for k, m, tie, lab in rs],
            "k long, ts timestamp, tie long, lab string",
        )
        got = {
            (r.from_label, r.to_label): (r.n_trans, r.row_ppm)
            for r in transition_matrix(df, "k", "ts", "lab", "tie").collect()
        }
        assert got == _ref_transitions(rs), rs

    check()


@pytest.mark.slow
def test_decayed_counts_property(spark):
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.temporal import decayed_counts

    t0 = dt.datetime(2026, 1, 1)
    hl = 60  # seconds
    row = st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(0, 500),  # age seconds before t0 (spans many buckets)
    )
    rows = st.lists(row, min_size=1, max_size=12)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rs=rows)
    def check(rs):
        max_age = min(a for _, a in rs)  # newest event defines the epoch
        df = spark.createDataFrame(
            [(g, t0 - dt.timedelta(seconds=a)) for g, a in rs],
            "g string, ts timestamp",
        )
        got = {
            r.group: (r.n_events, r.decayed_score)
            for r in decayed_counts(df, "g", "ts", half_life_s=hl).collect()
        }
        want: dict = {}
        for g, a in rs:
            k = min((a - max_age) // hl, 40)
            n, s = want.get(g, (0, 0))
            want[g] = (n + 1, s + (1_000_000 >> k))
        assert got == want, rs

    check()
