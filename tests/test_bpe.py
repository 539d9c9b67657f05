"""BPE tokenizer training/encoding vs a pure-Python reference
implementation of the classic algorithm (Sennrich et al. 2016:
get_stats counts overlapping adjacent pairs, merge applies
left-to-right non-overlapping). Any divergence on any corpus is a
semantics bug in the marker-wrapped string formulation."""

from __future__ import annotations

from collections import Counter

import pytest


def _ref_train(texts, n_merges, min_count=1):
    wf = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.strip().split():
            if w:
                wf[w] += 1
    vocab = {tuple(list(w) + ["\x03"]): c for w, c in wf.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (a, b), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((rank, a, b, a + b, n))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def _ref_encode(t, merges):
    toks = []
    for w in (t or "").strip().split():
        if not w:
            continue
        syms = list(w) + ["\x03"]
        for _, a, b, m, _n in merges:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(s.replace("\x03", "</w>") for s in syms)
    return toks


CORPUS = [
    (1, "low low low lower lowest"),
    (2, "newer newer new news"),
    (3, "widest wide wider new low"),
    (4, None),
    (5, "   "),
    (6, "aaa aa a aaaa"),  # overlapping-pair + run-merge edge cases
    (7, "x" + "\x01" + "y bad marker word ok"),  # marker byte: word dropped
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_train_matches_reference(corpus_df):
    from cassandra_diff_spark.operators.vocab import bpe_train

    texts = [t.replace("x\x01y", "") if t and "\x01" in t else t for _, t in CORPUS]
    want = _ref_train(texts, 12)
    got = bpe_train(corpus_df, "text", 12)
    assert got == want


def test_bpe_encode_matches_reference(corpus_df):
    from cassandra_diff_spark.operators.vocab import (
        bpe_encode_documents,
        bpe_train,
    )

    merges = bpe_train(corpus_df, "text", 10)
    enc = {
        r.id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode_documents(
            corpus_df, "doc_id", "text", merges
        ).collect()
    }
    for did, t in CORPUS:
        if t is None:
            assert did not in enc  # null text rows are dropped
            continue
        clean = " ".join(
            w for w in t.split() if "\x01" not in w and "\x02" not in w
        )
        want = _ref_encode(clean, merges)
        assert enc[did][0] == want, (did, enc[did][0], want)
        assert enc[did][1] == len(want)


def test_bpe_train_exhausts_small_corpus(spark):
    from cassandra_diff_spark.operators.vocab import bpe_train

    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    # "ab" -> a b </w>: merges (a,b), (ab,</w>) then nothing left
    merges = bpe_train(df, "text", 50)
    assert [m[:4] for m in merges] == [
        (1, "a", "b", "ab"),
        (2, "ab", "\x03", "ab\x03"),
    ]


def test_bpe_min_count_stops_early(spark):
    from cassandra_diff_spark.operators.vocab import bpe_train

    df = spark.createDataFrame(
        [(1, "aa aa aa zq")], "doc_id long, text string"
    )
    merges = bpe_train(df, "text", 50, min_count=2)
    # pairs of "zq" occur once each and must never merge
    assert all(n >= 2 for *_rest, n in merges)
    assert merges == _ref_train(["aa aa aa zq"], 50, min_count=2)
    # the first merge is (a, \x03): the end-of-word byte sorts before
    # 'a', so it wins the count tie — "aa" itself never merges
    assert merges[0][1:3] == ("a", "\x03")


def test_bpe_encode_empty_and_whitespace(spark):
    from cassandra_diff_spark.operators.vocab import bpe_encode_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "a")], "doc_id long, text string"
    )
    enc = {
        r.id: (list(r.tokens), r.n_tokens)
        for r in bpe_encode_documents(df, "doc_id", "text", []).collect()
    }
    assert enc[1] == ([], 0)
    assert enc[2] == ([], 0)
    assert enc[3] == (["a", "</w>"], 2)


def test_bpe_plans_stay_map_only(spark, corpus_df):
    """Scale contract: encoding never explodes or shuffles the token
    stream (zero Exchange, zero Generate); pair counting adds exactly
    ONE shuffle beyond the word-count build."""
    from cassandra_diff_spark.operators.vocab import (
        bpe_encode_documents,
        bpe_pair_counts,
        bpe_word_counts,
    )

    enc = bpe_encode_documents(
        corpus_df, "doc_id", "text", [(1, "l", "o", "lo", 6)]
    )
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0 and plan.count("Generate") == 0

    wc = bpe_word_counts(corpus_df, "text")
    base = wc._jdf.queryExecution().executedPlan().toString()
    pairs = bpe_pair_counts(wc)._jdf.queryExecution().executedPlan().toString()
    assert pairs.count("Exchange") == base.count("Exchange") + 1


def test_bpe_property_random_corpora(spark):
    """Hypothesis over tiny alphabets (merge collisions and run-heavy
    words are the adversarial shapes for the marker-wrapped REPLACE
    formulation): train + encode must match the pure-Python reference
    on every generated corpus."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cassandra_diff_spark.operators.vocab import (
        bpe_encode_documents,
        bpe_train,
    )

    word = st.text(alphabet="ab", min_size=1, max_size=5)
    doc = st.lists(word, min_size=0, max_size=6).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=4)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=corpus)
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        merges = bpe_train(df, "text", 6)
        assert merges == _ref_train(texts, 6), texts
        enc = {
            r.id: list(r.tokens)
            for r in bpe_encode_documents(df, "doc_id", "text", merges).collect()
        }
        for i, t in enumerate(texts):
            assert enc[i] == _ref_encode(t, merges), (t, merges)

    check()


class TestIncrementalTrain:
    """bpe_train_incremental must be byte-identical to bpe_train / the
    pure-Python reference — only the bookkeeping moves (driver-side
    pair-count dict + signed per-merge deltas from affected words)."""

    def test_matches_batch_and_reference(self, corpus_df):
        from cassandra_diff_spark.operators.vocab import (
            bpe_train,
            bpe_train_incremental,
        )

        texts = [t.replace("x\x01y", "") if t and "\x01" in t else t for _, t in CORPUS]
        want = _ref_train(texts, 12)
        assert bpe_train_incremental(corpus_df, "text", 12) == want
        assert bpe_train(corpus_df, "text", 12) == want

    def test_exhaustion_and_min_count(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
        merges = bpe_train_incremental(df, "text", 50)
        assert [m[:4] for m in merges] == [
            (1, "a", "b", "ab"),
            (2, "ab", "\x03", "ab\x03"),
        ]
        df2 = spark.createDataFrame(
            [(1, "aa aa aa bb")], "doc_id long, text string"
        )
        # min_count=3 excludes every bb-pair (count 1); the merge list
        # must equal the reference's, including the (a,\x03)-before-(a,a)
        # tie-break (\x03 < 'a' bytewise)
        want = _ref_train(["aa aa aa bb"], 9, min_count=3)
        assert bpe_train_incremental(df2, "text", 9, min_count=3) == want
        assert all(m[4] >= 3 for m in want) and want

    def test_pair_type_cap_fails_fast(self, corpus_df):
        import pytest as _pytest

        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        with _pytest.raises(ValueError, match="max_pair_types"):
            bpe_train_incremental(corpus_df, "text", 4, max_pair_types=3)

    def test_per_merge_work_tracks_affected_words(self, spark):
        """Work-proportionality evidence: the delta aggregation's input
        is the AFFECTED word types, not the corpus. 100 distinct filler
        words never contain any merged pair of the 'low*' family, so
        every merge's affected count stays bounded by the 4 low-words
        while the word table holds 104 types."""
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        # 100 filler word types built from globally-unique CJK chars:
        # every filler pair (incl. its end-of-word pair) occurs exactly
        # once, so min_count=2 keeps all merges inside the low-family
        fill = " ".join(
            chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i) for i in range(100)
        )
        rows = [
            (1, "low low low low lower lowest lowly"),
            (2, fill),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stats: list = []
        merges = bpe_train_incremental(df, "text", 6, min_count=2, stats=stats)
        assert merges  # the low-family merges exist
        assert len(stats) == len(merges)
        # stats rows are (rank, n_affected, n_delta, tstamp) since r10
        for _rank, n_affected, _n_delta, *_ in stats:
            assert 1 <= n_affected <= 4, stats

    @pytest.mark.slow
    def test_256_merges_match_reference_on_documents(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        texts = [r.text for r in docs.select("text").collect()]
        want = _ref_train(texts, 256)
        got = bpe_train_incremental(docs, "text", 256)
        assert len(got) == len(want) == 256 or got == want
        assert got == want


class TestHybridDispatch:
    """The r9 driver-resident fast path must be byte-identical to the
    distributed delta loop — and the distributed loop must STAY pinned
    now that the default cap routes small word tables driver-side."""

    def test_local_equals_distributed_and_reference(self, corpus_df):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        texts = [t.replace("x\x01y", "") if t and "\x01" in t else t for _, t in CORPUS]
        want = _ref_train(texts, 12)
        local = bpe_train_incremental(corpus_df, "text", 12)  # under cap
        dist = bpe_train_incremental(corpus_df, "text", 12, driver_word_cap=0)
        assert local == want
        assert dist == want

    def test_stats_agree_between_paths(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = spark.createDataFrame(
            [(1, "low low low low lower lowest lowly aa bb aa")],
            "doc_id long, text string",
        )
        s_local: list = []
        s_dist: list = []
        m1 = bpe_train_incremental(df, "text", 6, stats=s_local)
        m2 = bpe_train_incremental(df, "text", 6, stats=s_dist, driver_word_cap=0)
        assert m1 == m2
        # compare the semantic fields; the r10 4th element is a
        # wall-clock stamp and differs between runs by construction
        assert [st[:3] for st in s_local] == [st[:3] for st in s_dist]

    def test_overlapping_run_word(self, spark):
        """'aaa': left-to-right non-overlapping replace must agree
        between Python str.replace (local path) and Spark REPLACE
        (distributed path) — the classic BPE edge case."""
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = spark.createDataFrame(
            [(1, "aaa aaa aa a")], "doc_id long, text string"
        )
        local = bpe_train_incremental(df, "text", 8)
        dist = bpe_train_incremental(df, "text", 8, driver_word_cap=0)
        assert local == dist

    def test_cap_boundary_routes_distributed(self, corpus_df):
        """driver_word_cap=1 is below the fixture's word-type count, so
        the probe collects cap+1 rows, falls through, and the
        distributed loop must produce the same merges."""
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        assert bpe_train_incremental(
            corpus_df, "text", 12, driver_word_cap=1
        ) == bpe_train_incremental(corpus_df, "text", 12)

    def test_local_pair_cap_fails_fast(self, corpus_df):
        import pytest as _pytest

        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        with _pytest.raises(ValueError, match="max_pair_types"):
            bpe_train_incremental(corpus_df, "text", 4, max_pair_types=3)
