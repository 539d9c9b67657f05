"""Round-12 guards: the rendered ``</w>`` domain exclusion, the
bounded encode-UDF word cache, the long-word linear fallback, and the
one-entry-point auto-dispatch past MAX_EXPR_MERGES."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark import operators


def _enc_rows(df):
    return sorted(
        (r["id"], tuple(r["tokens"]), r["n_tokens"]) for r in df.collect()
    )


class TestEowDomainExclusion:
    """A word containing the LITERAL substring ``</w>`` would decode
    with a spurious boundary (the rendered end-of-word marker is the
    one reserved token of the output alphabet) — r11 ADVICE closed the
    hole by excluding such words from the domain up front, in BOTH
    engines, exactly like the three marker bytes."""

    DOCS = [
        (1, "plain words survive"),
        (2, "bad</w>word is dropped entirely"),
        (3, "</w> alone also dropped"),
        (4, "mixed \x01marker and x</w>y both dropped keepme"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_word_counts_exclude_eow_literal(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_word_counts

        words = {
            r["word"] for r in bpe_word_counts(self._df(spark), "text").collect()
        }
        assert "keepme" in words and "plain" in words
        assert not any("</w>" in w or "\x01" in w for w in words)

    def test_both_encode_paths_drop_and_agree(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents,
            bpe_encode_documents_udf,
            bpe_train,
        )

        df = self._df(spark)
        merges = bpe_train(df, "text", 4)
        a = _enc_rows(bpe_encode_documents(df, "doc_id", "text", merges))
        b = _enc_rows(bpe_encode_documents_udf(df, "doc_id", "text", merges))
        assert a == b
        toks = {t for _, ts, _ in a for t in ts}
        # the rendered marker appears ONLY as the end-of-word suffix
        for t in toks:
            assert not t.removesuffix("</w>").count("</w>")

    def test_roundtrip_with_eow_literal_words(self, spark):
        """decode(encode(x)) == ' '.join(kept words) even when the raw
        text contains literal '</w>' words — the exact failure mode the
        domain exclusion closes."""
        from cassandra_diff_spark.operators.vocab import (
            bpe_decode_documents,
            bpe_encode_documents,
            bpe_train,
        )

        df = self._df(spark)
        merges = bpe_train(df, "text", 4)
        enc = bpe_encode_documents(df, "doc_id", "text", merges)
        got = {
            r["id"]: r["text"]
            for r in bpe_decode_documents(enc, "id", "tokens").collect()
        }
        want = {
            i: " ".join(
                w
                for w in t.split()
                if "</w>" not in w
                and not any(c in w for c in "\x01\x02\x03")
            )
            for i, t in self.DOCS
        }
        assert got == want


class TestEncodeUdfBounds:
    """r11 ADVICE (medium) + VERDICT #2: the per-task distinct-word
    cache is size-capped and pathological word lengths route through
    the linear-in-length replay — output NEVER changes, only memory
    and worst-case time are bounded."""

    def _train(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train

        df = spark.createDataFrame(
            [(1, "aa ab aab aaab banana bandana ana"),
             (2, "aaaa aaa aa a abab abab")] * 3,
            "doc_id long, text string",
        )
        return df, bpe_train(df, "text", 12)

    def test_tiny_cache_caps_do_not_change_output(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents_udf,
        )

        df, merges = self._train(spark)
        base = _enc_rows(bpe_encode_documents_udf(df, "doc_id", "text", merges))
        capped = _enc_rows(
            bpe_encode_documents_udf(
                df,
                "doc_id",
                "text",
                merges,
                cache_max_entries=2,
                cache_max_chars=8,
            )
        )
        assert base == capped

    def test_tiny_output_batch_does_not_change_output(self, spark):
        """r12: the output-frame token budget flushes mid-input-batch;
        mapInPandas concatenates the yielded frames, so a 1-token
        budget (a flush after every document) must be value- and
        order-identical to the default."""
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents_udf,
        )

        df, merges = self._train(spark)
        base = _enc_rows(bpe_encode_documents_udf(df, "doc_id", "text", merges))
        chunked = _enc_rows(
            bpe_encode_documents_udf(
                df, "doc_id", "text", merges, out_batch_tokens=1
            )
        )
        assert base == chunked

    def test_long_word_linear_fallback_same_output(self, spark):
        """A multi-100k-char whitespace-free word (VERDICT #2's probe
        case): the quadratic greedy kernel would stall for minutes; the
        replay fallback is linear and value-identical."""
        from cassandra_diff_spark.operators.vocab import (
            _bpe_encode_word_py,
            bpe_encode_documents_udf,
        )

        _, merges = self._train(spark)
        monster = ("ab" * 60_000) + "banana" + ("a" * 30_000)
        assert len(monster) > 100_000
        df = spark.createDataFrame(
            [(1, monster), (2, "banana ab")], "doc_id long, text string"
        )
        rows = {
            r["id"]: list(r["tokens"])
            for r in bpe_encode_documents_udf(
                df, "doc_id", "text", merges
            ).collect()
        }
        assert rows[1] == _bpe_encode_word_py(monster, merges)
        # short words still take the greedy kernel — same values either way
        assert rows[2][-1].endswith("</w>")

    def test_greedy_cap_boundary_is_value_transparent(self, spark):
        """Words on either side of greedy_max_chars encode identically
        whichever kernel serves them."""
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents_udf,
        )

        df, merges = self._train(spark)
        text = "abab " * 4 + "banana"
        probe = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        via_greedy = _enc_rows(
            bpe_encode_documents_udf(
                probe, "doc_id", "text", merges, greedy_max_chars=10_000
            )
        )
        via_replay = _enc_rows(
            bpe_encode_documents_udf(
                probe, "doc_id", "text", merges, greedy_max_chars=0
            )
        )
        assert via_greedy == via_replay


class TestEncodeAutoDispatch:
    """VERDICT r11 #4: bpe_encode_documents is ONE entry point — past
    MAX_EXPR_MERGES it transparently returns the UDF twin's plan; only
    low-level bpe_apply keeps the fail-fast raise."""

    def _padded_merges(self, spark, n_pad):
        from cassandra_diff_spark.operators.vocab import bpe_train

        df = spark.createDataFrame(
            [(1, "aa ab banana bandana ana ab aa")],
            "doc_id long, text string",
        )
        merges = bpe_train(df, "text", 6)
        rank0 = len(merges)
        # pad with merges over symbols absent from the corpus: no-ops on
        # every word, but they push len(merges) past the expression cap
        pad = [
            (rank0 + k + 1, f"Z{k}", f"Q{k}", f"Z{k}Q{k}", 1)
            for k in range(n_pad)
        ]
        return df, merges + pad

    def test_past_cap_returns_udf_plan_with_same_values(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            MAX_EXPR_MERGES,
            bpe_encode_documents,
            bpe_encode_documents_udf,
        )

        df, merges = self._padded_merges(spark, MAX_EXPR_MERGES + 5)
        assert len(merges) > MAX_EXPR_MERGES
        out = bpe_encode_documents(df, "doc_id", "text", merges)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, plan[:2000]
        assert _enc_rows(out) == _enc_rows(
            bpe_encode_documents_udf(df, "doc_id", "text", merges)
        )

    def test_under_cap_stays_expression_path(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            bpe_encode_documents,
        )

        df, merges = self._padded_merges(spark, 0)
        plan = (
            bpe_encode_documents(df, "doc_id", "text", merges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" not in plan

    def test_bpe_apply_still_raises_past_cap(self, spark):
        from cassandra_diff_spark.operators.vocab import (
            MAX_EXPR_MERGES,
            bpe_apply,
        )

        _, merges = self._padded_merges(spark, MAX_EXPR_MERGES + 5)
        with pytest.raises(ValueError, match="MAX_EXPR_MERGES"):
            bpe_apply(F.lit("banana"), merges)


class TestClusterStagedBatch:
    """VERDICT r11 #5: the over-cap distributed loop's Zipf-head
    batches run CLUSTER-side (persisted staged frame + one JVM-side
    delta job per merge) instead of collecting 30-110k words for
    driver-side Python diffs. The merge sequence must stay
    byte-identical across every regime, the per-merge stats must agree
    with the driver-batch bookkeeping, and the staged persist chain
    must release every frame it pins."""

    def _corpus(self, spark):
        # overlapping word shapes so early merges touch many words and
        # batches sustain multiple merges (created pairs join local_ok)
        base = [
            "the cat sat on the mat with the bat",
            "that cat and that bat chat on a mat",
            "the rat sat where the cat sat",
            "matting and batting and chatting",
            "a hat on a cat on a mat",
        ]
        rows = [(i, base[i % len(base)]) for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cluster_path_matches_driver_paths(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = self._corpus(spark)
        local = bpe_train_incremental(df, "text", 24)
        clus = bpe_train_incremental(
            df, "text", 24, driver_word_cap=0, cluster_delta_min_words=1
        )
        drv = bpe_train_incremental(
            df, "text", 24, driver_word_cap=0, cluster_delta_min_words=0
        )
        assert clus == local
        assert drv == local

    def test_wide_batch_pairs_skips_mask_path_same_merges(self, spark):
        """batch_pairs > 64 exceeds the two-long-column bitmask
        encoding, so sizing/staging fall back to the per-candidate
        contains scans with the recount-built candidate-only index —
        the r12 Arrow-staging rewrite touched that branch too, so pin
        its merge sequence to the driver-resident reference."""
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = self._corpus(spark)
        local = bpe_train_incremental(df, "text", 24)
        wide = bpe_train_incremental(
            df, "text", 24, driver_word_cap=0, batch_pairs=80
        )
        assert wide == local

    def test_cluster_stats_agree_with_driver_batch(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = self._corpus(spark)
        s_clus: list = []
        s_drv: list = []
        m1 = bpe_train_incremental(
            df, "text", 12, driver_word_cap=0, cluster_delta_min_words=1,
            stats=s_clus, stats_every=1,
        )
        m2 = bpe_train_incremental(
            df, "text", 12, driver_word_cap=0, cluster_delta_min_words=0,
            stats=s_drv, stats_every=1,
        )
        assert m1 == m2
        # (rank, n_affected, n_delta) identical; element 3 is wall clock
        assert [s[:3] for s in s_clus] == [s[:3] for s in s_drv]

    def test_cluster_path_releases_staged_frames(self, spark):
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        sc = spark.sparkContext
        before = len(sc._jsc.sc().getRDDStorageInfo())
        bpe_train_incremental(
            self._corpus(spark), "text", 24,
            driver_word_cap=0, cluster_delta_min_words=1,
        )
        assert len(sc._jsc.sc().getRDDStorageInfo()) == before

    def test_top_pair_over_word_cap_stays_batched(self, spark):
        """batch_word_cap=1 once forced a per-merge degrade to the
        single-merge distributed step; with the cluster stage nothing
        is collected, so the batch machinery carries regardless."""
        from cassandra_diff_spark.operators.vocab import bpe_train_incremental

        df = self._corpus(spark)
        want = bpe_train_incremental(df, "text", 16)
        got = bpe_train_incremental(
            df, "text", 16, driver_word_cap=0,
            batch_word_cap=1, cluster_delta_min_words=1,
        )
        assert got == want


class TestNeighborDiffKernel:
    """r12 head-window optimization: _bpe_merge_step_local computes
    per-merge deltas from the adjacencies AROUND each merged occurrence
    (occurrence-walk with flush-adjacency ownership dedupe) instead of
    whole-word recounts. Its (aff, net, rewritten-words) must be
    IDENTICAL to the recount reference on any input — including the
    pathological shapes: a==b runs (xxx...), flush-adjacent occurrences
    (abab), occurrences at word start/end, multi-char symbols whose
    concatenations collide."""

    @staticmethod
    def _wrap(syms):
        from cassandra_diff_spark.operators.vocab import _BPE_L, _BPE_R

        return "".join(_BPE_L + s + _BPE_R for s in syms)

    def _run_both(self, word_syms, merge_pairs):
        """Apply a merge sequence through both kernels on the same word
        set; compare aff/net/words at every step."""
        import copy

        from cassandra_diff_spark.operators.vocab import (
            _bpe_merge_step_local,
            _bpe_merge_step_local_ref,
            _bpe_pair_counts_local,
        )

        words_a = [[cnt, self._wrap(sy)] for cnt, sy in word_syms]
        words_b = copy.deepcopy(words_a)
        # full initial index for both (the _bpe_train_local shape)
        def build_index(words_):
            ix: dict = {}
            for widx, (_, s_) in enumerate(words_):
                for p in _bpe_pair_counts_local(s_):
                    ix.setdefault(p, set()).add(widx)
            return ix

        ix_a = build_index(words_a)
        ix_b = build_index(words_b)
        for a, b in merge_pairs:
            aff_a, net_a = _bpe_merge_step_local(words_a, ix_a, a, b)
            aff_b, net_b = _bpe_merge_step_local_ref(words_b, ix_b, a, b)
            assert sorted(aff_a) == sorted(aff_b), (a, b)
            assert net_a == net_b, (a, b, net_a, net_b)
            assert words_a == words_b, (a, b)

    def test_pathological_shapes(self):
        cases = [
            # (words, merges) — syms given unmerged, merges applied in order
            ([(3, list("xxx"))], [("x", "x")]),
            ([(2, list("xxxx"))], [("x", "x"), ("xx", "xx")]),
            ([(1, list("xxxxx"))], [("x", "x"), ("xx", "x")]),
            ([(5, list("abab"))], [("a", "b"), ("ab", "ab")]),
            ([(1, list("ababa"))], [("a", "b"), ("ab", "ab")]),
            ([(1, list("xyx")), (2, list("yxy"))], [("x", "y"), ("y", "x")]),
            # concatenation collision: (x, yz) and (xy, z) both make xyz
            ([(1, ["x", "y", "z", "x", "y", "z"])],
             [("y", "z"), ("x", "yz")]),
            ([(1, list("zab")), (4, list("abz")), (2, list("ab"))],
             [("a", "b"), ("z", "ab"), ("ab", "z")]),
        ]
        for words, merges in cases:
            self._run_both(words, merges)

    def test_property_random_merge_sequences(self):
        import random

        rnd = random.Random(20260816)
        from cassandra_diff_spark.operators.vocab import (
            _bpe_pair_counts_local,
        )

        for trial in range(60):
            n_words = rnd.randint(1, 12)
            words = []
            for _ in range(n_words):
                L = rnd.randint(1, 14)
                words.append(
                    (rnd.randint(1, 9),
                     [rnd.choice("xyz") for _ in range(L)])
                )
            # walk real merges: always pick a pair that currently exists
            import copy

            from cassandra_diff_spark.operators.vocab import (
                _bpe_merge_step_local,
                _bpe_merge_step_local_ref,
            )

            words_a = [[c, self._wrap(sy)] for c, sy in words]
            words_b = copy.deepcopy(words_a)

            def build_index(ws):
                ix: dict = {}
                for widx, (_, s_) in enumerate(ws):
                    for p in _bpe_pair_counts_local(s_):
                        ix.setdefault(p, set()).add(widx)
                return ix

            ix_a, ix_b = build_index(words_a), build_index(words_b)
            for _ in range(rnd.randint(1, 8)):
                live = {}
                for _, s_ in words_a:
                    live.update(_bpe_pair_counts_local(s_))
                if not live:
                    break
                pair = rnd.choice(sorted(live))
                aff_a, net_a = _bpe_merge_step_local(
                    words_a, ix_a, pair[0], pair[1]
                )
                aff_b, net_b = _bpe_merge_step_local_ref(
                    words_b, ix_b, pair[0], pair[1]
                )
                assert sorted(aff_a) == sorted(aff_b), (trial, pair)
                assert net_a == net_b, (trial, pair, net_a, net_b)
                assert words_a == words_b, (trial, pair)


class TestUnigramTokenizer:
    """r12 beyond-reference surface: the unigram-LM (SentencePiece-
    style) tokenizer family — hard-EM training over the word-TYPE
    table, Viterbi encode, piece-free decode. The kernel is pinned to
    brute force, training to byte-reproducibility, and the encode/
    decode pair to the exact round-trip contract the gates hash."""

    def _corpus(self, spark):
        rows = [
            (1, "low lower lowest low low"),
            (2, "new newer newest new newer"),
            (3, "wide wider widest wide"),
            (4, "low new wide lower newer wider"),
        ] * 5
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_viterbi_matches_brute_force(self):
        import itertools
        import random

        from cassandra_diff_spark.operators.unigram import _viterbi

        rnd = random.Random(20260817)

        def brute(word, logp, unk):
            n = len(word)
            best_score, best_segs = None, None
            # all 2^(n-1) cut sets
            for mask in range(1 << (n - 1)):
                cuts = [0] + [
                    i + 1 for i in range(n - 1) if mask >> i & 1
                ] + [n]
                segs = [word[a:b] for a, b in zip(cuts, cuts[1:])]
                s = 0.0
                ok = True
                for p in segs:
                    lp = logp.get(p)
                    if lp is None:
                        if len(p) == 1:
                            lp = unk
                        else:
                            ok = False
                            break
                    s += lp
                if not ok:
                    continue
                if best_score is None or s > best_score:
                    best_score, best_segs = s, [segs]
                elif s == best_score:
                    best_segs.append(segs)
            return best_score, best_segs

        for _ in range(200):
            n = rnd.randint(1, 9)
            word = "".join(rnd.choice("abc") for _ in range(n))
            pieces = set()
            for _ in range(rnd.randint(2, 10)):
                i = rnd.randrange(n)
                j = rnd.randint(i + 1, n)
                pieces.add(word[i:j])
            logp = {p: round(rnd.uniform(-5, -0.5), 2) for p in pieces}
            got = _viterbi(word, logp, max(map(len, pieces)), -20.0)
            score, segs = brute(word, logp, -20.0)
            got_score = sum(
                logp.get(p, -20.0) for p in got
            )
            assert "".join(got) == word
            assert got_score == pytest.approx(score, abs=1e-12)
            assert got in segs  # a true argmax, tie or not

    def test_train_deterministic_and_sized(self, spark):
        from cassandra_diff_spark.operators.unigram import unigram_train

        df = self._corpus(spark)
        a = unigram_train(df, "text", 24, max_piece_len=5,
                          seed_multiplier=2, em_iters=1, prune_frac=0.5)
        b = unigram_train(df, "text", 24, max_piece_len=5,
                          seed_multiplier=2, em_iters=1, prune_frac=0.5)
        assert a == b
        assert len(a) <= 24 + 26  # target + char floor
        chars = {p for p, _ in a if len(p) == 1}
        corpus_chars = set("▁lownewriedst")
        assert corpus_chars <= chars  # coverage never pruned

    def test_hot_piece_survives(self, spark):
        from cassandra_diff_spark.operators.unigram import unigram_train

        df = self._corpus(spark)
        pieces = dict(
            unigram_train(df, "text", 20, max_piece_len=5,
                          seed_multiplier=2, em_iters=2, prune_frac=0.5)
        )
        # 'low'/'new' dominate the corpus; their marker-prefixed pieces
        # must out-survive junk substrings
        assert any(p in pieces for p in ("▁low", "▁new", "low", "new"))

    def test_roundtrip_adversarial(self, spark):
        from cassandra_diff_spark.operators.unigram import (
            unigram_decode_documents,
            unigram_encode_documents_udf,
            unigram_train,
        )

        df = self._corpus(spark)
        pieces = unigram_train(df, "text", 24, max_piece_len=5,
                               seed_multiplier=2, em_iters=1,
                               prune_frac=0.5)
        adv = spark.createDataFrame(
            [
                (1, "low lower zebra"),          # unseen chars (z,b,r,a)
                (2, "  spaced   out  "),
                (3, ""),
                (4, None),
                (5, "naïve café über"),           # unicode
                (6, "keep drop▁me keep2"),        # marker word dropped
            ],
            "doc_id long, text string",
        )
        enc = unigram_encode_documents_udf(adv, "doc_id", "text", pieces)
        got = {
            r["id"]: r["text"]
            for r in unigram_decode_documents(enc, "id", "tokens").collect()
        }
        assert got == {
            1: "low lower zebra",
            2: "spaced out",
            3: "",
            5: "naïve café über",
            6: "keep keep2",
        }

    def test_unknown_char_becomes_own_token(self):
        from cassandra_diff_spark.operators.unigram import _viterbi

        logp = {"▁": -1.0, "a": -1.0, "▁a": -0.5}
        toks = _viterbi("▁aqa", logp, 2, -20.0)
        assert "".join(toks) == "▁aqa"
        assert "q" in toks  # unknown char admitted as its own piece

    def test_caps_and_output_budget_value_transparent(self, spark):
        from cassandra_diff_spark.operators.unigram import (
            unigram_encode_documents_udf,
            unigram_train,
        )

        df = self._corpus(spark)
        pieces = unigram_train(df, "text", 24, max_piece_len=5,
                               seed_multiplier=2, em_iters=1,
                               prune_frac=0.5)
        base = _enc_rows(
            unigram_encode_documents_udf(df, "doc_id", "text", pieces)
        )
        bounded = _enc_rows(
            unigram_encode_documents_udf(
                df, "doc_id", "text", pieces,
                cache_max_entries=2, cache_max_chars=8,
                out_batch_tokens=1,
            )
        )
        assert base == bounded


class TestFunnelCachedLinks:
    """r12 continuation: `funnel_steps` caches each link's as-of join
    result (it forks into the drop-off branch and the next link) — the
    plan must hit InMemoryTableScan, values must not move, and
    release_caches() must drop every pinned link frame."""

    ROWS = [
        (1, "signup", 100, 1),
        (1, "click", 200, 2),
        (1, "purchase", 300, 3),
        (2, "signup", 100, 4),
        (2, "click", 150, 5),
        (3, "signup", 500, 6),
    ]

    def _df(self, spark):
        from pyspark.sql import functions as SF

        return spark.createDataFrame(
            self.ROWS, "user_id long, event_type string, us long, event_id long"
        ).select(
            "user_id", "event_type", "event_id",
            SF.timestamp_micros(SF.col("us")).alias("ts"),
        )

    def _funnel(self, spark):
        from cassandra_diff_spark.operators.temporal import funnel_steps

        return funnel_steps(
            self._df(spark),
            ["user_id"],
            ts_col="ts",
            step_col="event_type",
            steps=["signup", "click", "purchase"],
            within_us=10_000,
            tiebreak="event_id",
        )

    def test_links_cached_and_values_pinned(self, spark):
        try:
            out = self._funnel(spark)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan
            got = {
                r["user_id"]: (
                    r["t1"] and r["t1"].microsecond,
                    r["t2"] and r["t2"].microsecond,
                    r["t3"] and r["t3"].microsecond,
                )
                for r in out.collect()
            }
        finally:
            operators.release_caches()
        assert got == {
            1: (100, 200, 300),
            2: (100, 150, None),
            3: (500, None, None),
        }

    def test_release_caches_drops_link_frames(self, spark):
        sc = spark.sparkContext
        before = len(sc._jsc.sc().getRDDStorageInfo())
        self._funnel(spark).count()
        assert len(sc._jsc.sc().getRDDStorageInfo()) >= before + 1
        operators.release_caches()
        assert len(sc._jsc.sc().getRDDStorageInfo()) == before


class TestSpearmanSizeAdaptiveJoin:
    """`spearman_correlations` broadcasts each value->rank map when the
    measured distinct count bounds it under `broadcast_rank_map_bytes`
    (the r12 fix for Catalyst's garbage post-aggregation size estimate)
    and falls back to a shuffle join above — the branch a
    billion-distinct column takes at 100 TB, which fixture-scale gates
    never exercise. Ranks are exact on both paths, so the outputs must
    agree to the bit."""

    N = 10_000  # x all-distinct > 2 * _RANK_BUCKET_ROWS: bucketed path on

    def _frame(self, spark):
        rows = [
            (float(i) / 7.0, float(i // 3), float(i % 7)) for i in range(self.N)
        ]
        return spark.createDataFrame(rows, "x double, y double, z double")

    @staticmethod
    def _rows(df):
        return sorted(
            (r["col_i"], r["col_j"], r["n"], r["rho"]) for r in df.collect()
        )

    def test_shuffle_branch_bit_identical_to_broadcast(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            got_b = self._rows(spearman_correlations(df, ["x", "y", "z"]))
            got_s = self._rows(
                spearman_correlations(
                    df, ["x", "y", "z"], broadcast_rank_map_bytes=0
                )
            )
        finally:
            operators.release_caches()
        # exact tuple equality: same pairs, same n, same rho BITS —
        # the join strategy must never touch the exact rank machinery
        assert got_b == got_s
        assert len(got_b) == 6  # 3 columns -> i <= j pairs

    def test_knob_controls_join_strategy(self, spark):
        """The parameter's entire job is placing (or withholding) the
        broadcast hint on the rank maps: with the default cap the
        spearman plan carries no SortMergeJoin (the r12 plan claim,
        plans/r12/profile_spearman_after.txt); with the cap at 0 the
        rank-map join-backs plan as SortMergeJoin again."""
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            plan_b = (
                spearman_correlations(df, ["x", "y"])
                ._jdf.queryExecution().executedPlan().toString()
            )
            plan_s = (
                spearman_correlations(df, ["x", "y"], broadcast_rank_map_bytes=0)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            operators.release_caches()
        assert "SortMergeJoin" not in plan_b
        assert "SortMergeJoin" in plan_s
