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


# ---------------------------------------------------------------------------
# round 9 additions: cluster-balanced sampling, phrase blocklist, Spearman


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestClusterBalancedSample:
    def _frame(self, spark, n=40, dim=3):
        rows = [
            (
                i,
                [((_md5_60(f"{i}:{d}") % 2001) - 1000) / 1000.0 for d in range(dim)],
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_matches_pure_python_replica(self, spark):
        from cassandra_diff_spark.operators.curate import cluster_balanced_sample
        from cassandra_diff_spark.operators.similarity import _plane_weight

        dim, n_planes, target = 3, 4, 2
        df = self._frame(spark, 40, dim)
        got = {
            r["vec_id"]: (r["cell"], r["cell_n"])
            for r in cluster_balanced_sample(
                df, "vec_id", "embedding", dim=dim,
                target_per_cell=target, n_planes=n_planes, seed=7,
            ).collect()
        }

        # replica: quantize -> sign bits over the shared plane weights
        rows = df.collect()
        cells = {}
        for r in rows:
            q = [round(float(x) * 1000) for x in r["embedding"]]
            key = 0
            for p in range(n_planes):
                proj = sum(q[d] * _plane_weight(p, d) for d in range(dim))
                if proj > 0:
                    key |= 1 << p
            cells[r["vec_id"]] = key
        from collections import Counter

        pop = Counter(cells.values())
        want = {
            i: (cells[i], pop[cells[i]])
            for i in cells
            if (_md5_60(f"{i}:7") % 1_000_000) * pop[cells[i]] < target * 1_000_000
        }
        assert got == want
        assert 0 < len(got) < 40  # the fixture actually exercises both branches

    def test_saturated_target_is_identity(self, spark):
        from cassandra_diff_spark.operators.curate import cluster_balanced_sample

        df = self._frame(spark, 25)
        out = cluster_balanced_sample(
            df, "vec_id", "embedding", dim=3, target_per_cell=25
        )
        assert sorted(r["vec_id"] for r in out.collect()) == list(range(25))

    def test_null_and_wrong_dim_dropped(self, spark):
        from cassandra_diff_spark.operators.curate import cluster_balanced_sample

        df = spark.createDataFrame(
            [(1, [0.5, 0.5, 0.5]), (2, None), (3, [0.1]), (None, [0.2, 0.2, 0.2])],
            "vec_id long, embedding array<float>",
        )
        out = cluster_balanced_sample(
            df, "vec_id", "embedding", dim=3, target_per_cell=10
        ).collect()
        assert [r["vec_id"] for r in out] == [1]

    def test_validates_target(self, spark):
        from cassandra_diff_spark.operators.curate import cluster_balanced_sample

        with pytest.raises(ValueError, match="target_per_cell"):
            cluster_balanced_sample(
                self._frame(spark, 4), "vec_id", "embedding", dim=3, target_per_cell=0
            )


class TestPhraseBlocklist:
    def test_hand_case(self, spark):
        from cassandra_diff_spark.operators.curate import phrase_blocklist

        df = spark.createDataFrame(
            [
                (1, "Lorem IPSUM dolor sit"),        # case-insensitive hit
                (2, "click here to subscribe now"),  # multi-word phrase hit
                (3, "lorem ipsum and click here to subscribe"),  # both
                (4, "loremipsum"),                   # no space -> no hit
                (5, None),                           # null text -> kept
            ],
            "doc_id long, text string",
        )
        out = {
            r["id"]: (r["n_phrases_hit"], r["blocked"])
            for r in phrase_blocklist(
                df, "doc_id", "text", ["lorem ipsum", "click here to subscribe"]
            ).collect()
        }
        assert out == {
            1: (1, True),
            2: (1, True),
            3: (2, True),
            4: (0, False),
            5: (0, False),
        }

    def test_validates_phrases(self, spark):
        from cassandra_diff_spark.operators.curate import phrase_blocklist

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="phrases"):
            phrase_blocklist(df, "doc_id", "text", [])
        with pytest.raises(ValueError, match="phrases"):
            phrase_blocklist(df, "doc_id", "text", ["ok", ""])


def _ref_spearman(xs, ys):
    """Textbook average-rank Spearman in plain floats."""

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    return None if dx == 0 or dy == 0 else num / (dx * dy)


class TestSpearmanCorrelations:
    def _rho(self, out, a, b):
        for r in out:
            if r["col_i"] == a and r["col_j"] == b:
                return r["rho"]
        raise KeyError((a, b))

    def test_monotone_transform_is_exactly_one(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        rows = [(float(i - 7), float((i - 7) ** 3), float(7 - i)) for i in range(15)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = spearman_correlations(df, ["x", "y", "z"]).collect()
        assert self._rho(out, "x", "y") == 1.0   # x^3 is monotone in x
        assert self._rho(out, "x", "z") == -1.0  # exact reversal
        assert self._rho(out, "x", "x") == 1.0

    def test_ties_match_reference(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        xs = [1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0, 8.0]
        ys = [3.0, 1.0, 4.0, 4.0, 2.0, 9.0, 9.0, 9.0]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        out = spearman_correlations(df, ["x", "y"]).collect()
        assert self._rho(out, "x", "y") == pytest.approx(
            _ref_spearman(xs, ys), abs=1e-12
        )

    def test_constant_column_null_and_listwise_n(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = spark.createDataFrame(
            [(1.0, 4.0, 2.0), (2.0, 4.0, None), (3.0, 4.0, 1.0), (4.0, 4.0, 0.0)],
            "x double, c double, z double",
        )
        out = spearman_correlations(df, ["x", "c", "z"]).collect()
        assert all(r["n"] == 3 for r in out)  # the None row is gone everywhere
        assert self._rho(out, "x", "c") is None
        assert self._rho(out, "x", "z") == -1.0

    def test_validates_cols(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="at least 2"):
            spearman_correlations(df, ["x"])


def test_phrase_blocklist_map_only_plan(spark):
    """The C4 screen must stay a scan-time predicate: no Exchange, no
    Python eval in the executed plan (the classifier_score discipline)."""
    import re

    from cassandra_diff_spark.operators.curate import phrase_blocklist

    df = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(10)], "doc_id long, text string"
    )
    out = phrase_blocklist(df, "doc_id", "text", ["lorem ipsum", "bad phrase"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    data_exchanges = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bExchange (hash|range|rebalance)", ln)
    ]
    assert not data_exchanges, plan


def _ref_kendall_tau_b(xs, ys):
    """Textbook O(n^2) tau-b over row pairs."""
    n = len(xs)
    s = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            s += dx * dy
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
    n0 = n * (n - 1) // 2
    if n0 == n1 or n0 == n2:
        return None
    return s / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))


class TestKendallTau:
    def test_matches_row_pair_reference(self, spark):
        from cassandra_diff_spark.operators.validate import kendall_tau

        xs = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 5.0, 8.0, 8.0, 1.0]
        ys = [2.0, 1.0, 4.0, 4.0, 2.0, 9.0, 9.0, 9.0, 3.0, 2.0]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        row = kendall_tau(df, "x", "y").collect()[0]
        assert row["n"] == 10 and row["n0"] == 45
        assert row["tau_b"] == pytest.approx(_ref_kendall_tau_b(xs, ys), abs=1e-12)

    def test_perfect_and_reversed(self, spark):
        from cassandra_diff_spark.operators.validate import kendall_tau

        rows = [(float(i), float(i * i), float(-i)) for i in range(12)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        assert kendall_tau(df, "x", "y").collect()[0]["tau_b"] == 1.0
        assert kendall_tau(df, "x", "z").collect()[0]["tau_b"] == -1.0

    def test_constant_column_null_and_null_rows_excluded(self, spark):
        from cassandra_diff_spark.operators.validate import kendall_tau

        df = spark.createDataFrame(
            [(1.0, 4.0), (2.0, 4.0), (3.0, 4.0), (None, 1.0), (4.0, None)],
            "x double, c double",
        )
        row = kendall_tau(df, "x", "c").collect()[0]
        assert row["n"] == 3 and row["tau_b"] is None

    def test_cell_cap_fails_fast(self, spark):
        from cassandra_diff_spark.operators.validate import kendall_tau

        df = spark.createDataFrame(
            [(float(i), float(i % 7)) for i in range(40)], "x double, y double"
        )
        with pytest.raises(ValueError, match="max_cells"):
            kendall_tau(df, "x", "y", max_cells=10)


def _ref_theils_u(pairs):
    """(mi_micronat, ha, hb, ua_milli, ub_milli) with the engine's
    per-term integer rounding."""
    from collections import Counter

    n = len(pairs)
    jc = Counter(pairs)
    ac = Counter(a for a, _ in pairs)
    bc = Counter(b for _, b in pairs)
    mi = sum(
        round((c / n) * math.log(c * n / (ac[a] * bc[b])) * 1e6)
        for (a, b), c in jc.items()
    )
    ha = sum(round((c / n) * math.log(n / c) * 1e6) for c in ac.values())
    hb = sum(round((c / n) * math.log(n / c) * 1e6) for c in bc.values())
    ua = None if ha <= 0 else (max(mi, 0) * 1000) // ha
    ub = None if hb <= 0 else (max(mi, 0) * 1000) // hb
    return mi, ha, hb, ua, ub


class TestTheilsU:
    def test_matches_reference_and_is_asymmetric(self, spark):
        from cassandra_diff_spark.operators.stats import theils_u

        # status fully determined by code; code barely predictable from
        # status -> U(status|code) = 1000, U(code|status) << 1000
        pairs = [(f"s{i % 3}", f"c{i}") for i in range(12)] * 2
        df = spark.createDataFrame(pairs, "a string, b string")
        row = theils_u(df, "a", "b").collect()[0]
        mi, ha, hb, ua, ub = _ref_theils_u(pairs)
        assert (
            row["mi_micronat"],
            row["ha_micronat"],
            row["hb_micronat"],
            row["u_a_given_b_milli"],
            row["u_b_given_a_milli"],
        ) == (mi, ha, hb, ua, ub)
        assert row["u_a_given_b_milli"] == 1000  # fully determined
        assert row["u_b_given_a_milli"] < 500    # far from it

    def test_constant_column_null_and_null_category(self, spark):
        from cassandra_diff_spark.operators.stats import theils_u

        df = spark.createDataFrame(
            [("x", "p"), ("x", "q"), ("x", None)], "a string, b string"
        )
        row = theils_u(df, "a", "b").collect()[0]
        assert row["u_a_given_b_milli"] is None  # H(a) = 0
        assert row["u_b_given_a_milli"] == 0     # MI = 0, H(b) > 0
        assert row["n_rows"] == 3                # NULL b is a category

    def test_independent_columns_clamp_to_zero(self, spark):
        from cassandra_diff_spark.operators.stats import theils_u

        pairs = [(f"a{i % 2}", f"b{j % 3}") for i in range(2) for j in range(3)] * 5
        df = spark.createDataFrame(pairs, "a string, b string")
        row = theils_u(df, "a", "b").collect()[0]
        assert row["u_a_given_b_milli"] == 0
        assert row["u_b_given_a_milli"] == 0


def test_cluster_balanced_sample_precomputed_cells(spark):
    """cells=(id, cell) frame: the keep decision must be identical to
    the hyperplane path given the same assignment, and unassigned rows
    drop."""
    from cassandra_diff_spark.operators.curate import cluster_balanced_sample

    df = spark.createDataFrame(
        [(i, [0.1 * i, -0.2, 0.3]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    asg = spark.createDataFrame(
        [(i, i % 3) for i in range(18)], "vid long, grp long"
    )
    out = cluster_balanced_sample(
        df, "vec_id", "embedding", dim=3, target_per_cell=4, seed=1, cells=asg
    ).collect()
    import hashlib

    def h(i):
        return int(hashlib.md5(f"{i}:1".encode()).hexdigest()[:15], 16) % 1_000_000

    pop = {g: 6 for g in range(3)}  # 18 ids over 3 cells
    want = {
        i: (i % 3, 6) for i in range(18) if h(i) * pop[i % 3] < 4 * 1_000_000
    }
    got = {r["vec_id"]: (r["cell"], r["cell_n"]) for r in out}
    assert got == want
    assert 18 not in got and 19 not in got  # unassigned rows dropped


class TestCalibrationBins:
    def test_hand_case_and_clamps(self, spark):
        from cassandra_diff_spark.operators.evaluate import calibration_bins

        rows = [
            (-50, True),   # below lo -> bin 0
            (0, False),    # [0,25) -> bin 2 of [-50,50)/4
            (10, True),    # bin 2
            (24, True),    # bin 2
            (25, False),   # bin 3
            (99, True),    # above hi -> clamps to bin 3
            (None, True),  # dropped
            (30, None),    # dropped
        ]
        df = spark.createDataFrame(rows, "s long, l boolean")
        out = {
            r["bin"]: (r["n"], r["n_pos"], r["score_sum"], r["pos_per_mille"])
            for r in calibration_bins(
                df, "s", "l", n_bins=4, lo=-50, hi=50
            ).collect()
        }
        assert out == {
            0: (1, 1, -50, 1000),
            2: (3, 2, 34, 666),
            3: (2, 1, 124, 500),  # the (30, None) row is dropped
        }

    def test_validates_args(self, spark):
        from cassandra_diff_spark.operators.evaluate import calibration_bins

        df = spark.createDataFrame([(1, True)], "s long, l boolean")
        with pytest.raises(ValueError, match="n_bins"):
            calibration_bins(df, "s", "l", n_bins=0, lo=0, hi=10)
        with pytest.raises(ValueError, match="hi > lo"):
            calibration_bins(df, "s", "l", n_bins=4, lo=10, hi=10)


class TestEncodeDocumentsJoin:
    def test_equals_map_path_on_adversarial_fixture(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            encode_documents,
            encode_documents_join,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat", "en"),
                (2, "", "en"),            # empty -> empty array
                (3, "   ", "de"),         # whitespace -> empty array
                (4, None, None),          # NULL -> NULL ids
                (5, "unknown words only", "fr"),
                (6, "the the the", "en"),  # duplicates keep positions
                (7, "cat", "en"),
            ],
            "doc_id long, text string, lang string",
        )
        vocab = spark.createDataFrame(
            [(1, "the"), (2, "cat"), (3, "mat")], "token_id int, token string"
        )
        a = {
            r["doc_id"]: (
                r["token_ids"],
                r["n_tokens"],
                r["n_oov"],
                r["lang"],
            )
            for r in encode_documents(
                docs, "doc_id", "text", vocab, oov_id=0, keep_cols=("lang",)
            ).collect()
        }
        b = {
            r["doc_id"]: (
                r["token_ids"],
                r["n_tokens"],
                r["n_oov"],
                r["lang"],
            )
            for r in encode_documents_join(
                docs, "doc_id", "text", vocab, oov_id=0, keep_cols=("lang",)
            ).collect()
        }
        assert a == b
        assert a[1][0] == [1, 2, 0, 0, 1, 3]  # order preserved, OOV = 0
        assert a[4][0] is None and a[2][0] == []


class TestHashEmbedTfidfJoin:
    def test_equals_map_path(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            doc_frequencies,
            hash_embed_tfidf,
            hash_embed_tfidf_join,
        )

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, ""),                      # zero vector
                (3, "   "),                   # zero vector
                (4, None),                    # excluded
                (5, "novel tokens here"),
                (6, "the the cat"),           # tf weighting
            ],
            "doc_id long, text string",
        )
        a = {
            r["doc_id"]: (r["emb"], r["n_tokens"])
            for r in hash_embed_tfidf(docs, "doc_id", "text", dim=8).collect()
        }
        b = {
            r["doc_id"]: (r["emb"], r["n_tokens"])
            for r in hash_embed_tfidf_join(docs, "doc_id", "text", dim=8).collect()
        }
        assert a == b
        assert 4 not in a and a[2] == ([0] * 8, 0)

        # frozen-idf path: score against a df table from a DIFFERENT corpus
        frozen = doc_frequencies(
            spark.createDataFrame([(9, "the cat")], "doc_id long, text string"),
            "doc_id",
            "text",
        )
        a2 = {
            r["doc_id"]: (r["emb"], r["n_tokens"])
            for r in hash_embed_tfidf(
                docs, "doc_id", "text", dim=8, dfreq=frozen, n_docs=1
            ).collect()
        }
        b2 = {
            r["doc_id"]: (r["emb"], r["n_tokens"])
            for r in hash_embed_tfidf_join(
                docs, "doc_id", "text", dim=8, dfreq=frozen, n_docs=1
            ).collect()
        }
        assert a2 == b2 and a2 != a
