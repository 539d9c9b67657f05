"""Vocabulary build + document encoding (operators/vocab.py)."""

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.vocab import (
    build_vocab,
    encode_documents,
    token_counts,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "a cat and a dog"),
            (4, ""),
            (5, "   "),
            (6, "zebra"),
        ],
        "doc_id long, text string",
    )


class TestBuildVocab:
    def test_counts_and_order(self, spark, corpus):
        v = build_vocab(corpus, "text", vocab_size=4).collect()
        # counts: the=3, a=2, cat=2, dog=2, sat=2, ... tie-break token asc
        assert [(r.token_id, r.token, r.n) for r in v] == [
            (1, "the", 3),
            (2, "a", 2),
            (3, "cat", 2),
            (4, "dog", 2),
        ]

    def test_min_count_and_first_id(self, spark, corpus):
        v = build_vocab(corpus, "text", vocab_size=100, min_count=2, first_id=5)
        rows = v.collect()
        assert all(r.n >= 2 for r in rows)
        assert min(r.token_id for r in rows) == 5
        assert "zebra" not in {r.token for r in rows}

    def test_empty_docs_contribute_nothing(self, spark, corpus):
        toks = {r.token for r in token_counts(corpus, "text").collect()}
        assert "" not in toks

    def test_deterministic_across_runs(self, spark, corpus):
        a = sorted(map(tuple, build_vocab(corpus, "text", vocab_size=6).collect()))
        b = sorted(map(tuple, build_vocab(corpus, "text", vocab_size=6).collect()))
        assert a == b


class TestEncodeDocuments:
    def test_roundtrip_ids_order_and_oov(self, spark, corpus):
        v = build_vocab(corpus, "text", vocab_size=4)
        enc = {
            r.doc_id: r
            for r in encode_documents(corpus, "doc_id", "text", v).collect()
        }
        # vocab: the=1 a=2 cat=3 dog=4; everything else OOV=0
        assert enc[1].token_ids == [1, 3, 0, 0, 1, 0]
        assert enc[1].n_tokens == 6 and enc[1].n_oov == 3
        assert enc[3].token_ids == [2, 3, 0, 2, 4]
        assert enc[4].token_ids == [] and enc[4].n_tokens == 0
        assert enc[5].token_ids == []  # whitespace-only == empty
        assert enc[6].token_ids == [0] and enc[6].n_oov == 1

    def test_custom_oov_id(self, spark, corpus):
        v = build_vocab(corpus, "text", vocab_size=2, first_id=1)
        enc = {
            r.doc_id: r
            for r in encode_documents(
                corpus, "doc_id", "text", v, oov_id=-1
            ).collect()
        }
        assert enc[6].token_ids == [-1] and enc[6].n_oov == 1

    def test_encode_is_map_only(self, spark, corpus):
        """The corpus side must not shuffle. With a pre-materialized
        vocab, the ONLY shuffle Exchange in the whole plan is the vocab
        map-aggregation's (V rows); the token stream itself is never
        exploded or shuffled."""
        v = spark.createDataFrame(
            [("the", 1), ("cat", 2)], "token string, token_id int"
        )
        plan = encode_documents(corpus, "doc_id", "text", v)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert shuffles <= 1, plan


class TestIncrementalVocab:
    def test_fold_equals_one_shot(self, spark, corpus):
        """vocab_from_counts(fold(persisted, batch)) == build_vocab over
        the union — the corpus is never re-tokenized."""
        from cassandra_diff_spark.operators.vocab import (
            build_vocab,
            fold_token_counts,
            token_counts,
            vocab_from_counts,
        )

        hist = corpus.filter(F.col("doc_id") <= 3)
        batch = corpus.filter(F.col("doc_id") > 3)
        persisted = token_counts(hist, "text")
        folded = vocab_from_counts(
            fold_token_counts(persisted, batch, "text"), vocab_size=6
        )
        once = build_vocab(corpus, "text", vocab_size=6)
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, once.collect())
        )


class TestHashEmbed:
    def test_vector_semantics(self, spark):
        from cassandra_diff_spark.functions.text import md5_hash64
        from cassandra_diff_spark.operators.vocab import hash_embed

        df = spark.createDataFrame(
            [(1, "the cat the dog"), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        d = 8
        out = {r.doc_id: r for r in hash_embed(df, "doc_id", "text", dim=d).collect()}
        assert out[2].emb == [0] * d and out[2].n_tokens == 0
        assert out[3].emb == [0] * d
        # brute-force expectation from the same hash function
        hv = {
            r.t: r.h
            for r in spark.createDataFrame(
                [("the",), ("cat",), ("dog",)], "t string"
            ).select("t", md5_hash64(F.col("t")).alias("h")).collect()
        }
        exp = [0] * d
        for tok in ["the", "cat", "the", "dog"]:
            h = hv[tok]
            exp[h % d] += 1 if (h // d) % 2 == 0 else -1
        assert out[1].emb == exp
        assert out[1].n_tokens == 4

    def test_map_only_plan(self, spark):
        from cassandra_diff_spark.operators.vocab import hash_embed

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = hash_embed(df, "doc_id", "text")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan

    def test_feeds_embedding_operators(self, spark):
        """The hashed vectors drop straight into the centroid profiler —
        the text -> vector -> monitoring bridge."""
        from cassandra_diff_spark.operators.embeddings import embedding_centroids
        from cassandra_diff_spark.operators.vocab import hash_embed

        df = spark.createDataFrame(
            [(i, f"doc number {i % 3} words", ["a", "b"][i % 2]) for i in range(20)],
            "doc_id long, text string, grp string",
        )
        emb = hash_embed(df, "doc_id", "text", dim=8).join(
            df.select("doc_id", "grp"), "doc_id"
        ).select("doc_id", "grp", F.col("emb").cast("array<float>").alias("emb"))
        cent = embedding_centroids(emb, "emb", dim=8, by=["grp"])
        assert cent.count() == 16  # 2 groups x 8 dims


class TestLMUnigramScore:
    def test_hand_computed(self, spark):
        import math
        from cassandra_diff_spark.operators.vocab import LM_SCALE, lm_unigram_score

        # corpus: T=4 tokens, V=2 distinct ('a' x3, 'b' x1), alpha=1
        df = spark.createDataFrame(
            [(1, "a a a"), (2, "b")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in lm_unigram_score(df, "doc_id", "text").collect()}
        lp = lambda n: round(math.log((n + 1.0) / (4 + 2.0)) * LM_SCALE)  # noqa: E731
        assert out[1].logprob_u == 3 * lp(3) and out[1].n_tokens == 3
        assert out[2].logprob_u == lp(1) and out[2].n_tokens == 1

    def test_frozen_model_scores_oov(self, spark):
        import math
        from cassandra_diff_spark.operators.vocab import (
            LM_SCALE,
            lm_unigram_score,
            token_counts,
        )

        train = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
        counts = token_counts(train, "text")  # T=3, V=2
        new = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
        out = lm_unigram_score(new, "doc_id", "text", counts=counts).collect()[0]
        exp = round(math.log(3.0 / 5.0) * LM_SCALE) + round(math.log(1.0 / 5.0) * LM_SCALE)
        assert out.logprob_u == exp  # OOV token falls back to alpha mass

    def test_empty_doc_scores_zero(self, spark):
        from cassandra_diff_spark.operators.vocab import lm_unigram_score

        df = spark.createDataFrame([(1, "a"), (2, " ")], "doc_id long, text string")
        out = {r.doc_id: (r.n_tokens, r.logprob_u)
               for r in lm_unigram_score(df, "doc_id", "text").collect()}
        assert out[2] == (0, 0)

    def test_gibberish_scores_below_fluent(self, spark):
        from cassandra_diff_spark.operators.vocab import lm_unigram_score, token_counts

        train = spark.createDataFrame(
            [(i, "the quick brown fox jumps") for i in range(20)],
            "doc_id long, text string",
        )
        counts = token_counts(train, "text")
        probe = spark.createDataFrame(
            [(1, "the quick brown fox jumps"), (2, "zxq vbnm qwerty asdf hjkl")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.logprob_u / r.n_tokens
               for r in lm_unigram_score(probe, "doc_id", "text", counts=counts).collect()}
        assert out[1] > out[2]


class TestHashEmbedTfidf:
    """vocab.hash_embed_tfidf — idf-weighted hashing-trick vectors."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (1, "the cat sat"),
            (2, "the dog ran"),
            (3, "the cat ran fast"),
            (4, "the the the"),  # tf stacking on a stopword
            (5, ""),             # empty -> zero vector
            (6, None),           # excluded
        ]
        return spark.createDataFrame(rows, "id long, text string")

    def test_matches_python_reference(self, spark, corpus):
        import hashlib
        import math

        from cassandra_diff_spark.operators.vocab import hash_embed_tfidf

        rows = {r.doc_id: r for r in hash_embed_tfidf(corpus, "id", "text", dim=16).collect()}
        docs = {1: "the cat sat", 2: "the dog ran", 3: "the cat ran fast", 4: "the the the", 5: ""}
        n = 5
        dfv = {}
        for t in docs.values():
            for tok in set(t.split()):
                dfv[tok] = dfv.get(tok, 0) + 1
        def h64(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        for did, text in docs.items():
            exp = [0] * 16
            for tok in text.split():
                if not tok:
                    continue
                hv = h64(tok)
                wu = round(math.log((n + 1) / (dfv[tok] + 1)) * 1_000_000)
                exp[hv % 16] += wu if hv % 32 < 16 else -wu
            assert list(rows[did].emb) == exp, did
        assert 6 not in rows and rows[5].n_tokens == 0

    def test_stopword_weight_vanishes(self, spark, corpus):
        """'the' appears in every non-empty doc with text -> df=N-1?? no:
        df=4 of N=5 -> idf small; a unique token's weight is much larger."""
        import math

        small = round(math.log(6 / 5) * 1e6)   # 'the': df=4, N=5
        big = round(math.log(6 / 2) * 1e6)     # unique tokens: df=1
        assert big > 5 * small

    def test_frozen_model_incremental(self, spark, corpus):
        """Embedding a new batch against a persisted dfreq + n_docs gives
        the same vectors the one-shot run gave those documents."""
        from cassandra_diff_spark.operators.vocab import (
            doc_frequencies,
            hash_embed_tfidf,
        )

        dfreq = doc_frequencies(corpus, "id", "text")
        frozen = {r.doc_id: list(r.emb) for r in hash_embed_tfidf(
            corpus.filter("id <= 3"), "id", "text", dim=16,
            dfreq=dfreq, n_docs=5,
        ).collect()}
        oneshot = {r.doc_id: list(r.emb) for r in hash_embed_tfidf(
            corpus, "id", "text", dim=16,
        ).collect()}
        assert frozen == {k: v for k, v in oneshot.items() if k <= 3}

    def test_map_only_fold(self, spark, corpus, tmp_path):
        """No Exchange between the scan and the vector fold besides the
        two 1-row broadcast sides (idf map + N)."""
        from cassandra_diff_spark.operators.vocab import (
            doc_frequencies,
            hash_embed_tfidf,
        )

        dpath, fpath = str(tmp_path / "docs"), str(tmp_path / "dfreq")
        corpus.write.mode("overwrite").parquet(dpath)
        src = spark.read.parquet(dpath)
        doc_frequencies(src, "id", "text").write.mode("overwrite").parquet(fpath)
        dfreq = spark.read.parquet(fpath)
        plan = (
            hash_embed_tfidf(src, "id", "text", dim=16, dfreq=dfreq, n_docs=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # against a persisted idf model the whole plan is shuffle-free:
        # the idf map collapses via a SinglePartition agg and joins in as
        # a 1-row broadcast; the token stream never hash-partitions
        assert "Exchange hashpartitioning" not in plan


class TestCooccurrence:
    def test_window_and_symmetry(self, spark):
        from cassandra_diff_spark.operators.vocab import cooccurrence_counts

        df = spark.createDataFrame([(1, "a b c a")], "id long, text string")
        # window=2 directed pairs: (a,b) (a,c) (b,c) (b,a) (c,a)
        directed = {
            (r.token_a, r.token_b): r.n
            for r in cooccurrence_counts(
                df, "text", window=2, symmetric=False
            ).collect()
        }
        # i=1: (a,b) (a,c); i=2: (b,c) (b,a); i=3: (c,a)
        assert directed == {
            ("a", "b"): 1,
            ("a", "c"): 1,
            ("b", "c"): 1,
            ("b", "a"): 1,
            ("c", "a"): 1,
        }
        sym = {
            (r.token_a, r.token_b): r.n
            for r in cooccurrence_counts(
                df, "text", window=2, symmetric=True
            ).collect()
        }
        # every directed count plus its mirror
        for (a, b), n in directed.items():
            assert sym[(a, b)] == n + directed.get((b, a), 0)

    def test_short_and_empty_docs_contribute_nothing(self, spark):
        from cassandra_diff_spark.operators.vocab import cooccurrence_counts

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, "  ")], "id long, text string"
        )
        assert cooccurrence_counts(df, "text").count() == 0

    def test_window_one_is_adjacent_bigrams(self, spark):
        from cassandra_diff_spark.operators.vocab import cooccurrence_counts

        df = spark.createDataFrame([(1, "x y z")], "id long, text string")
        got = {
            (r.token_a, r.token_b): r.n
            for r in cooccurrence_counts(
                df, "text", window=1, symmetric=False
            ).collect()
        }
        assert got == {("x", "y"): 1, ("y", "z"): 1}


class TestPMI:
    def test_reference_values(self, spark):
        import math

        from cassandra_diff_spark.operators.vocab import (
            cooccurrence_counts,
            pmi_pairs,
        )

        df = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "c d c d")], "id long, text string"
        )
        cooc = cooccurrence_counts(df, "text", window=1, symmetric=True)
        rows = {(r.token_a, r.token_b): r for r in pmi_pairs(cooc).collect()}
        # python reference over the same counts
        counts = {
            (r.token_a, r.token_b): r.n for r in cooc.collect()
        }
        nn = sum(counts.values())
        ca = {}
        cb = {}
        for (a, b), n in counts.items():
            ca[a] = ca.get(a, 0) + n
            cb[b] = cb.get(b, 0) + n
        for (a, b), n in counts.items():
            want = round(math.log(n * nn / (ca[a] * cb[b])) * 1e6)
            assert rows[(a, b)].pmi_micronat == want, (a, b)
        # bound tokens score higher than cross-corpus independence
        assert rows[("a", "b")].pmi_micronat > 0

    def test_min_count_filters_display_not_marginals(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            cooccurrence_counts,
            pmi_pairs,
        )

        df = spark.createDataFrame(
            [(1, "a b a b a b c")], "id long, text string"
        )
        cooc = cooccurrence_counts(df, "text", window=1, symmetric=True)
        all_rows = {
            (r.token_a, r.token_b): r.pmi_micronat
            for r in pmi_pairs(cooc, min_count=1).collect()
        }
        filt = {
            (r.token_a, r.token_b): r.pmi_micronat
            for r in pmi_pairs(cooc, min_count=2).collect()
        }
        # filtered rows vanish; surviving scores are unchanged (the
        # marginals still saw the rare pairs)
        assert ("b", "c") not in filt and ("b", "c") in all_rows
        for k, v in filt.items():
            assert all_rows[k] == v


class TestCooccurrencePlan:
    def test_single_shuffle_no_join(self, spark):
        """Pair generation is pure Catalyst over the words array: the
        ONLY exchange is the final pair-type groupBy; no join, no
        window, no Python."""
        from cassandra_diff_spark.operators.vocab import cooccurrence_counts

        df = spark.createDataFrame([(1, "a b c")], "id long, text string")
        p = (
            cooccurrence_counts(df, "text", window=2, symmetric=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert p.count("Exchange hashpartitioning") == 1
        assert "Join" not in p and "Window" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


class TestJSDivergence:
    def _counts(self, spark, d):
        return spark.createDataFrame(list(d.items()), "token string, n long")

    def test_identical_distributions_zero(self, spark):
        from cassandra_diff_spark.operators.vocab import js_divergence

        a = self._counts(spark, {"x": 6, "y": 2})
        b = self._counts(spark, {"x": 3, "y": 1})  # same shape, half mass
        r = js_divergence(a, b).collect()[0]
        assert r.js_micronat == 0
        assert (r.total_a, r.total_b, r.n_tokens_union) == (8, 4, 2)

    def test_disjoint_vocabularies_ln2(self, spark):
        from cassandra_diff_spark.operators.vocab import js_divergence

        a = self._counts(spark, {"x": 3, "y": 1})
        b = self._counts(spark, {"u": 2, "v": 2})
        r = js_divergence(a, b).collect()[0]
        # each side contributes p*ln(2)/2 terms summing to ln 2 exactly
        # (up to per-token rounding)
        assert abs(r.js_micronat - 693147) <= 2

    def test_python_reference(self, spark):
        import math

        from cassandra_diff_spark.operators.vocab import js_divergence

        ca = {"x": 5, "y": 3, "z": 2}
        cb = {"x": 1, "y": 7, "w": 4}
        A, B = sum(ca.values()), sum(cb.values())
        want = 0
        for t in set(ca) | set(cb):
            a, b = ca.get(t, 0), cb.get(t, 0)
            aB, bA = a * B, b * A
            s = 0.0
            if a:
                s += (a / A) * math.log(2.0 * aB / (aB + bA))
            if b:
                s += (b / B) * math.log(2.0 * bA / (aB + bA))
            want += round(s * 0.5 * 1e6)
        r = js_divergence(
            self._counts(spark, ca), self._counts(spark, cb)
        ).collect()[0]
        assert r.js_micronat == want
        assert 0 < r.js_micronat < 693147

    def test_symmetry(self, spark):
        from cassandra_diff_spark.operators.vocab import js_divergence

        a = self._counts(spark, {"x": 9, "y": 1})
        b = self._counts(spark, {"x": 2, "y": 8})
        ab = js_divergence(a, b).collect()[0].js_micronat
        ba = js_divergence(b, a).collect()[0].js_micronat
        assert ab == ba


class TestFoldCooccurrence:
    def test_fold_equals_rebuild(self, spark, corpus):
        from cassandra_diff_spark.operators.vocab import (
            cooccurrence_counts,
            fold_cooccurrence_counts,
            pmi_pairs,
        )

        hist = corpus.filter(F.col("doc_id") <= 3)
        batch = corpus.filter(F.col("doc_id") > 3)
        persisted = cooccurrence_counts(hist, "text", window=2)
        folded = fold_cooccurrence_counts(persisted, batch, "text", window=2)
        once = cooccurrence_counts(corpus, "text", window=2)
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, once.collect())
        )
        # and PMI over the fold equals PMI over the rebuild
        a = sorted(map(tuple, pmi_pairs(folded, min_count=2).collect()))
        b = sorted(map(tuple, pmi_pairs(once, min_count=2).collect()))
        assert a == b
