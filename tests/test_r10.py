"""Round-10 tests: bucketed Spearman ranking (the range-partitioned
prefix-sum rewrite), its plan invariant, and the vocab size cap."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark import operators


def _window_specs(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return set(re.findall(r"windowspecdefinition\([^)]*\)", plan))


def _ref_spearman(xs, ys):
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


class TestSpearmanBucketedPath:
    """The high-cardinality branch: distinct >= 2 * _RANK_BUCKET_ROWS so
    split points exist and ranking runs bucket-partitioned."""

    N = 10_000  # > 2 * _RANK_BUCKET_ROWS = 8192 distinct x values

    def _frame(self, spark):
        # x: all-distinct (the continuous-column regime the rewrite is
        # for); y: monotone-with-ties; z: coarse 7-level column so the
        # single-bucket path runs IN THE SAME CALL as the bucketed one
        rows = [
            (float(i) / 7.0, float(i // 3), float(i % 7)) for i in range(self.N)
        ]
        return spark.createDataFrame(rows, "x double, y double, z double")

    def test_matches_reference_and_exact_monotone(self, spark):
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            out = spearman_correlations(df, ["x", "y", "z"]).collect()
        finally:
            operators.release_caches()
        rho = {(r["col_i"], r["col_j"]): r["rho"] for r in out}
        assert all(r["n"] == self.N for r in out)
        xs = [float(i) / 7.0 for i in range(self.N)]
        ys = [float(i // 3) for i in range(self.N)]
        zs = [float(i % 7) for i in range(self.N)]
        assert rho[("x", "x")] == 1.0
        assert rho[("x", "y")] == pytest.approx(_ref_spearman(xs, ys), abs=1e-12)
        assert rho[("x", "z")] == pytest.approx(_ref_spearman(xs, zs), abs=1e-12)

    def test_no_unpartitioned_window_in_plan(self, spark):
        """The r9 defect: rank maps ranked via an UNPARTITIONED cumulative
        window — a single-task global sort of a data-sized distinct frame
        for continuous columns. The rewrite's invariant: every WindowExec
        in a spearman plan carries a partition spec (bucket column for
        split columns, the non-foldable zero bucket for small ones)."""
        from cassandra_diff_spark.operators.validate import spearman_correlations

        df = self._frame(spark)
        try:
            out = spearman_correlations(df, ["x", "y", "z"])
            specs = _window_specs(out)
        finally:
            operators.release_caches()
        assert specs, "expected window operators in the rank-map plan"
        for s in specs:
            first = s[len("windowspecdefinition("):].split(",")[0]
            assert " ASC" not in first and " DESC" not in first, (
                f"unpartitioned window spec in spearman plan: {s}"
            )

    def test_bucketed_path_actually_engaged(self, spark):
        """Guard against the bucket machinery silently degrading to one
        bucket (which would make the plan test vacuous): the x column
        must produce split points."""
        from cassandra_diff_spark.operators.validate import (
            _rank_buckets,
            _split_points_from_sample,
        )

        assert _rank_buckets(self.N) >= 2
        splits = _split_points_from_sample(sorted(range(1000)), 4)
        assert len(splits) == 3 and splits == sorted(splits)

    def test_rank_map_exact_for_any_split_placement(self, spark):
        """Ranks are exact for ANY boundaries — including degenerate ones
        (duplicated mass on one side, boundaries at extremes)."""
        from cassandra_diff_spark.operators.validate import _rank_map

        vals = spark.createDataFrame(
            [(v, c) for v, c in [(1.0, 3), (2.0, 1), (5.0, 2), (9.0, 4)]],
            "__v double, __cnt long",
        )
        for splits in ([], [2.0], [1.0, 9.0], [0.5, 3.0, 7.0]):
            got = {
                r["__v"]: r["r"]
                for r in _rank_map(vals, "r", list(splits)).collect()
            }
            # doubled avg ranks over 10 rows: 1:(0,3)->4, 2:(3,1)->8,
            # 5:(4,2)->11, 9:(6,4)->17
            assert got == {1.0: 4, 2.0: 8, 5.0: 11, 9.0: 17}, splits


def test_vocab_size_fail_fast_cap(spark):
    from cassandra_diff_spark.operators.vocab import (
        MAX_VOCAB_SIZE,
        build_vocab,
        vocab_from_counts,
    )

    counts = spark.createDataFrame([("a", 3)], "token string, n long")
    with pytest.raises(ValueError, match="MAX_VOCAB_SIZE"):
        vocab_from_counts(counts, vocab_size=MAX_VOCAB_SIZE + 1)
    docs = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError, match="MAX_VOCAB_SIZE"):
        build_vocab(docs, "text", vocab_size=MAX_VOCAB_SIZE + 1)
    # at the cap boundary the freeze still works
    assert vocab_from_counts(counts, vocab_size=10).count() == 1


class TestAdviceR9Fixes:
    """r9 ADVICE items: kendall/theils cache hygiene, calibration_bins
    overflow + backtickable score column."""

    def test_calibration_bins_extreme_scores_and_backticks(self, spark):
        from cassandra_diff_spark.operators.evaluate import calibration_bins

        # 2^62-scale scores: the old (score-lo)*n_bins overflowed BIGINT
        # before its clamp; the name needs backticks when spliced raw
        rows = [
            (-(2**62), True), (2**62, False), (-5, True),
            (0, False), (9, True), (10, False),
        ]
        df = spark.createDataFrame(rows, "`my score` long, lab boolean")
        got = {
            r["bin"]: (r["n"], r["n_pos"])
            for r in calibration_bins(
                df, "my score", "lab", n_bins=10, lo=0, hi=10
            ).collect()
        }
        assert got[0] == (3, 2)  # -2^62, -5, 0 clamp into bin 0
        assert got[9] == (3, 1)  # 9, 10, 2^62 clamp into bin 9

    def test_kendall_and_theils_do_not_leak_caches(self, spark):
        from cassandra_diff_spark.operators.stats import theils_u
        from cassandra_diff_spark.operators.validate import kendall_tau

        before = len(spark.sparkContext._jsc.getPersistentRDDs())
        k = kendall_tau(
            spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "x long, y long"),
            "x", "y",
        )
        assert k.count() == 1
        t = theils_u(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (1, "a")], "x long, y string"
            ),
            "x", "y",
        )
        assert t.collect()[0]["u_a_given_b_milli"] == 1000
        after = len(spark.sparkContext._jsc.getPersistentRDDs())
        assert after == before, "kendall/theils leaked a cached frame"


class TestKendallBinned:
    def test_raw_cap_rejects_binned_accepts(self, spark):
        from cassandra_diff_spark.operators.validate import (
            kendall_tau,
            kendall_tau_binned,
        )

        rows = [(float(i) * 1.01, float(i % 9)) for i in range(200)]
        df = spark.createDataFrame(rows, "x double, y double")
        with pytest.raises(ValueError, match="bin or quantize"):
            kendall_tau(df, "x", "y", max_cells=64)
        out = kendall_tau_binned(
            df, "x", "y",
            x_lo=0.0, x_width=50.0, x_bins=5,
            y_lo=0.0, y_width=1.0, y_bins=9,
        ).collect()[0]
        assert out["n"] == 200
        # grid 5x9 = 45 cells; tau defined (both axes vary)
        assert out["tau_b"] is not None

    def test_binned_equals_raw_on_prebinned_data(self, spark):
        """When values already sit on the grid, binning is the identity
        and binned tau must equal raw tau exactly."""
        from cassandra_diff_spark.operators.validate import (
            kendall_tau,
            kendall_tau_binned,
        )

        rows = [(float(i % 5), float((i * 3) % 7)) for i in range(100)]
        df = spark.createDataFrame(rows, "x double, y double")
        raw = kendall_tau(df, "x", "y").collect()[0]
        binned = kendall_tau_binned(
            df, "x", "y",
            x_lo=0.0, x_width=1.0, x_bins=5,
            y_lo=0.0, y_width=1.0, y_bins=7,
        ).collect()[0]
        assert raw.asDict() == binned.asDict()

    def test_grid_validation(self, spark):
        from cassandra_diff_spark.operators.validate import kendall_tau_binned

        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError, match="max_cells"):
            kendall_tau_binned(
                df, "x", "y",
                x_lo=0, x_width=1, x_bins=100,
                y_lo=0, y_width=1, y_bins=100,
            )
        with pytest.raises(ValueError, match="positive"):
            kendall_tau_binned(
                df, "x", "y",
                x_lo=0, x_width=1, x_bins=0,
                y_lo=0, y_width=1, y_bins=5,
            )


class TestStreamDecayedCounts:
    def test_drained_state_folds_with_batch_history(self, spark, tmp_path):
        """Stream state is a first-class citizen of the fold family: a
        drained stream slice folded with a batch-history slice must equal
        the batch aligned build over the union — the incremental
        contract, now closed over the streaming runtime too."""
        from pyspark.sql import Row
        from datetime import datetime, timedelta

        from cassandra_diff_spark.operators.temporal import (
            decayed_count_state,
            decayed_counts_aligned,
            decayed_counts_from_state,
            fold_decayed_states,
        )
        from cassandra_diff_spark.streaming.diff_stream import (
            stream_decayed_count_state,
        )

        t0 = datetime(2024, 1, 1)
        old = [Row(g="a", ts=t0 + timedelta(hours=h)) for h in range(6)]
        new = [
            Row(g=g, ts=t0 + timedelta(days=d, hours=h))
            for g in ("a", "b")
            for d in (3, 4)
            for h in range(3)
        ]
        hl = 86_400
        batch_old = spark.createDataFrame(old)
        batch_new = spark.createDataFrame(new)
        p = str(tmp_path / "slice")
        batch_new.coalesce(1).write.parquet(p)
        eb = max(r.ts for r in new).timestamp() * 1_000_000 // (hl * 1_000_000)
        stream = spark.readStream.schema("g string, ts timestamp").parquet(p)
        st_stream = stream_decayed_count_state(
            stream, "g", "ts", epoch_bucket=int(eb), half_life_s=hl,
            name="cds_test_decay_stream",
        )
        hist = decayed_count_state(batch_old, "g", "ts", half_life_s=hl)
        folded = decayed_counts_from_state(
            fold_decayed_states([hist, st_stream])
        )
        expect = decayed_counts_aligned(
            batch_old.unionByName(batch_new), "g", "ts", half_life_s=hl
        )
        got = {r["group"]: (r["n_events"], r["decayed_score"])
               for r in folded.collect()}
        want = {r["group"]: (r["n_events"], r["decayed_score"])
                for r in expect.collect()}
        assert got == want and got["a"][0] == 12

    def test_event_newer_than_epoch_fail_fasts(self, spark, tmp_path):
        from datetime import datetime

        from pyspark.sql import Row
        from pyspark.sql import functions as SF

        from cassandra_diff_spark.streaming.diff_stream import (
            stream_decayed_count_state,
        )

        rows = [Row(g="a", ts=datetime(2024, 6, 1))]
        p = str(tmp_path / "late")
        spark.createDataFrame(rows).coalesce(1).write.parquet(p)
        stream = spark.readStream.schema("g string, ts timestamp").parquet(p)
        with pytest.raises(Exception, match="newer than"):
            stream_decayed_count_state(
                stream, "g", "ts", epoch_bucket=100, half_life_s=86_400,
                name="cds_test_decay_late",
            )


def _replica_classifier_train(rows, *, d, n_groups, iters, lr_milli, bigrams=True):
    """Pure-Python/numpy replica of classifier_train's determinism
    contract: same hashing, same grouping, same accumulation order,
    same float ops — must reproduce the Spark weights BIT-EXACTLY."""
    import hashlib
    import re as _re

    import numpy as np

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = []
    for i, text, y in rows:
        if text is None:
            continue
        wsl = [w for w in _re.split(r"\s+", text.strip()) if w != ""]
        fs = list(wsl)
        if bigrams:
            fs += [a + "\x1f" + b for a, b in zip(wsl, wsl[1:])]
        hs = [h64(f) % d for f in fs]
        if not hs:
            continue
        docs.append((h64(str(i)) % n_groups, str(i), hs, float(y)))
    n = len(docs)
    lr = lr_milli / 1000.0
    w = np.zeros(d, dtype=np.float64)
    for _ in range(iters):
        g_total = np.zeros(d, dtype=np.float64)
        for gid in sorted({dc[0] for dc in docs}):
            grp = sorted(
                (dc for dc in docs if dc[0] == gid), key=lambda dc: dc[1]
            )
            lens = np.fromiter((len(dc[2]) for dc in grp), dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(dc[2], dtype=np.int64) for dc in grp]
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            z = np.add.reduceat(w[flat], starts)
            z = np.clip(z, -30.0, 30.0)
            prob = 1.0 / (1.0 + np.exp(-z))
            ys = np.asarray([dc[3] for dc in grp], dtype=np.float64)
            coef = np.repeat(prob - ys, lens)
            g = np.zeros(d, dtype=np.float64)
            np.add.at(g, flat, coef)
            # Arrow array<double> round-trips float64 exactly, so the
            # Spark fold sees the identical per-group vectors
            g_total += g
        w = w - lr * (g_total / n)
    return {
        b: u for b in range(d) if (u := int(round(float(w[b]) * 1e6))) != 0
    }


class TestClassifierTrain:
    def test_bit_identical_to_replica(self, spark):
        from cassandra_diff_spark.operators.curate import classifier_train

        pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
        rows = []
        for i in range(40):
            y = i % 2
            toks = [pool[(i * 7 + k) % len(pool)] for k in range(5 + i % 4)]
            toks += ["possent" if y else "negsent"] * 2
            rows.append((i, " ".join(toks), y))
        df = spark.createDataFrame(rows, "doc_id long, text string, y int")
        model = classifier_train(
            df, "doc_id", "text", "y",
            n_buckets=512, iters=5, lr_milli=3_000, n_groups=4,
        )
        got = {r["bucket"]: r["weight_u"] for r in model.collect()}
        want = _replica_classifier_train(
            rows, d=512, n_groups=4, iters=5, lr_milli=3_000
        )
        assert got == want

    def test_trained_model_separates_planted_labels(self, spark):
        from cassandra_diff_spark.operators.curate import (
            classifier_score,
            classifier_train,
        )
        from pyspark.sql import functions as SF

        rows = [
            (i, f"tok{i % 11} tok{(i * 3) % 11} "
                + ("goodmark goodmark" if i % 2 else "badmark badmark"),
             i % 2)
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, y int")
        model = classifier_train(
            df, "doc_id", "text", "y", n_buckets=256, iters=10, lr_milli=4_000
        )
        sc = classifier_score(
            df, "doc_id", "text", model, n_buckets=256
        ).withColumnRenamed("id", "doc_id")
        acc = (
            sc.join(df.select("doc_id", "y"), "doc_id")
            .select(
                SF.avg(
                    (SF.col("pred").cast("int") == SF.col("y")).cast("int")
                ).alias("a")
            )
            .first()["a"]
        )
        assert acc == 1.0

    def test_featureless_and_validation(self, spark):
        from cassandra_diff_spark.operators.curate import classifier_train

        df = spark.createDataFrame(
            [(1, "a b", 1), (2, None, 0), (3, "   ", 0), (4, "c d", 0)],
            "doc_id long, text string, y int",
        )
        # null/empty docs are excluded; training still runs on the rest
        model = classifier_train(
            df, "doc_id", "text", "y", n_buckets=64, iters=2, lr_milli=1_000
        )
        assert model.count() >= 1
        with pytest.raises(ValueError, match="positive"):
            classifier_train(
                df, "doc_id", "text", "y", n_buckets=0, iters=2
            )
        empty = spark.createDataFrame([], "doc_id long, text string, y int")
        with pytest.raises(ValueError, match="no labeled docs"):
            classifier_train(
                empty, "doc_id", "text", "y", n_buckets=64, iters=1
            )


def test_classifier_train_warm_start(spark):
    """Warm start resumes from the QUANTIZED persisted model: two warm
    runs from the same model are bit-equal, and continued training on
    the same separable data keeps the labels separated."""
    from cassandra_diff_spark.operators.curate import (
        classifier_score,
        classifier_train,
    )
    from pyspark.sql import functions as SF

    rows = [
        (i, f"w{i % 13} w{(i * 5) % 13} " + ("posm posm" if i % 2 else "negm negm"), i % 2)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    m1 = classifier_train(
        df, "doc_id", "text", "y", n_buckets=256, iters=6, lr_milli=4_000
    )
    warm_a = classifier_train(
        df, "doc_id", "text", "y",
        n_buckets=256, iters=4, lr_milli=4_000, init_model=m1,
    )
    warm_b = classifier_train(
        df, "doc_id", "text", "y",
        n_buckets=256, iters=4, lr_milli=4_000, init_model=m1,
    )
    wa = {r["bucket"]: r["weight_u"] for r in warm_a.collect()}
    wb = {r["bucket"]: r["weight_u"] for r in warm_b.collect()}
    assert wa == wb
    sc = classifier_score(
        df, "doc_id", "text", warm_a, n_buckets=256
    ).withColumnRenamed("id", "doc_id")
    acc = (
        sc.join(df.select("doc_id", "y"), "doc_id")
        .select(SF.avg((SF.col("pred").cast("int") == SF.col("y")).cast("int")).alias("a"))
        .first()["a"]
    )
    assert acc == 1.0
    bad = spark.createDataFrame([(999, 5)], "bucket long, weight_u long")
    with pytest.raises(ValueError, match="outside"):
        classifier_train(
            df, "doc_id", "text", "y",
            n_buckets=256, iters=1, init_model=bad,
        )


def test_calibration_bins_grid_overflow_fail_fast(spark):
    from cassandra_diff_spark.operators.evaluate import calibration_bins

    df = spark.createDataFrame([(1, True)], "s long, l boolean")
    with pytest.raises(ValueError, match="overflow"):
        calibration_bins(df, "s", "l", n_bins=4, lo=-(2**62), hi=2**62)
    # a wide-but-safe grid still works
    assert calibration_bins(
        df, "s", "l", n_bins=4, lo=-(2**31), hi=2**31
    ).count() == 1


def test_stream_decayed_counts_backtick_time_col(spark, tmp_path):
    from datetime import datetime

    from pyspark.sql import Row

    from cassandra_diff_spark.streaming.diff_stream import (
        stream_decayed_count_state,
    )

    rows = [Row(g="a", ts=datetime(2024, 1, 1))]
    p = str(tmp_path / "bt")
    spark.createDataFrame(rows).withColumnRenamed("ts", "event ts") \
        .coalesce(1).write.parquet(p)
    stream = spark.readStream.schema("g string, `event ts` timestamp").parquet(p)
    eb = int(datetime(2024, 1, 1).timestamp() * 1_000_000) // (86_400 * 1_000_000)
    st = stream_decayed_count_state(
        stream, "g", "event ts", epoch_bucket=eb + 1,
        half_life_s=86_400, name="cds_test_decay_bt",
    )
    got = st.collect()
    assert len(got) == 1 and got[0]["shift"] == 1 and got[0]["n"] == 1


class TestAucExact:
    def test_hand_case_with_ties(self, spark):
        from cassandra_diff_spark.operators.evaluate import auc_exact

        # pos scores [3,2], neg [1,2]: 3 winning pairs + 1 tie of 4
        # -> AUC = 3.5/4 = 0.875 exactly
        df = spark.createDataFrame(
            [(3, True), (2, True), (1, False), (2, False)], "s long, l boolean"
        )
        r = auc_exact(df, "s", "l").collect()[0]
        assert (r["n"], r["n_pos"], r["n_neg"], r["auc_ppm"]) == (4, 2, 2, 875000)

    def test_perfect_inverted_oneclass(self, spark):
        from cassandra_diff_spark.operators.evaluate import auc_exact

        perfect = spark.createDataFrame(
            [(i, i >= 50) for i in range(100)], "s long, l boolean"
        )
        assert auc_exact(perfect, "s", "l").collect()[0]["auc_ppm"] == 1_000_000
        inverted = spark.createDataFrame(
            [(i, i < 50) for i in range(100)], "s long, l boolean"
        )
        assert auc_exact(inverted, "s", "l").collect()[0]["auc_ppm"] == 0
        one = spark.createDataFrame([(1, True)], "s long, l boolean")
        assert auc_exact(one, "s", "l").collect()[0]["auc_ppm"] is None

    def test_matches_naive_pair_count(self, spark):
        from cassandra_diff_spark.operators.evaluate import auc_exact

        rows = [((i * 7) % 23, (i * 13) % 3 == 0) for i in range(200)]
        df = spark.createDataFrame(rows, "s long, l boolean")
        pos = [s for s, l in rows if l]
        neg = [s for s, l in rows if not l]
        u2 = sum(
            2 * sum(1 for nv in neg if pv > nv) + sum(1 for nv in neg if pv == nv)
            for pv in pos
        )
        want = (u2 * 1_000_000) // (2 * len(pos) * len(neg))
        got = auc_exact(df, "s", "l").collect()[0]
        assert got["auc_ppm"] == want


def test_stream_calibration_matches_batch(spark, tmp_path):
    from cassandra_diff_spark.operators.evaluate import calibration_bins
    from cassandra_diff_spark.streaming.diff_stream import (
        stream_calibration_bins,
    )

    rows = [((i * 17) % 100 - 50, i % 3 == 0) for i in range(500)]
    df = spark.createDataFrame(rows, "s long, l boolean")
    p = str(tmp_path / "scores")
    df.repartition(3).write.parquet(p)
    stream = spark.readStream.schema("s long, l boolean") \
        .option("maxFilesPerTrigger", 1).parquet(p)
    drained = stream_calibration_bins(
        stream, "s", "l", n_bins=5, lo=-50, hi=50,
        name="cds_test_calib_stream",
    )
    got = sorted(tuple(r) for r in drained.collect())
    want = sorted(
        tuple(r)
        for r in calibration_bins(df, "s", "l", n_bins=5, lo=-50, hi=50).collect()
    )
    assert got == want and len(got) == 5
