"""Round-13 focused tests: the optimization round rewrote the stateful
stream operators' per-key bodies from pandas to numpy/lists. The gates
and the existing stream-equals-batch tests pin the numeric-tiebreak
fast path (np.lexsort); these pin the paths no gate exercises — the
Python tuple-sort FALLBACK for non-numeric tiebreaks and the
nulls-lose tiebreak contract — plus the r13 classifier persist-order
invariant `_grad`'s sort-skip relies on.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

US = timedelta(microseconds=1)
T0 = datetime(2031, 3, 1)


def _drained(spark, tmp_path, left_rows, right_rows, rschema, **kw):
    from cassandra_diff_spark.streaming.diff_stream import stream_asof_join

    left = spark.createDataFrame(left_rows, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(right_rows, rschema)
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.coalesce(1).write.parquet(ldir)
    right.coalesce(1).write.parquet(rdir)
    return stream_asof_join(
        spark.readStream.schema(left.schema).parquet(ldir),
        spark.readStream.schema(right.schema).parquet(rdir),
        ["k"],
        right_cols=["v"],
        **kw,
    )


class TestAsofStringTiebreak:
    def test_string_tiebreak_takes_sort_fallback_and_picks_greatest(
        self, spark, tmp_path
    ):
        """A STRING tiebreak cannot lexsort numerically, so the per-key
        body takes the stable Python tuple-sort fallback; the greatest
        tiebreak among equal timestamps must still win, matching the
        batch operator's contract."""
        rows_r = [
            (1, T0 + 100 * US, "a", 1.0),
            (1, T0 + 100 * US, "c", 3.0),  # greatest tb at ts=100 -> wins
            (1, T0 + 100 * US, "b", 2.0),
        ]
        got = _drained(
            spark,
            tmp_path,
            [(1, T0 + 200 * US, 10)],
            rows_r,
            "k long, ts timestamp, tb string, v double",
            right_tiebreak="tb",
            name="t_r13_strtb",
        ).collect()
        assert len(got) == 1 and got[0]["r_v"] == 3.0

    def test_null_tiebreak_loses_to_any_value(self, spark, tmp_path):
        """nulls-first sort order means a NULL tiebreak LOSES to any
        non-null at the same timestamp (na_position='first' in the old
        pandas body; the notnull lexsort key / tuple key now)."""
        rows_r = [
            (1, T0 + 100 * US, None, 9.0),
            (1, T0 + 100 * US, 1, 5.0),
        ]
        got = _drained(
            spark,
            tmp_path,
            [(1, T0 + 200 * US, 10)],
            rows_r,
            "k long, ts timestamp, tb long, v double",
            right_tiebreak="tb",
            name="t_r13_nulltb",
        ).collect()
        assert len(got) == 1 and got[0]["r_v"] == 5.0


def test_classifier_feature_frame_arrives_gid_id_sorted(spark):
    """r13 persists the classifier feature frame sorted by (gid, id) so
    `_grad` can skip its per-iteration pandas sort. The skip is guarded
    (falls back to the stable sort when rows are not strictly
    id-sorted), but the fast path should actually ENGAGE: train on ids
    crafted to interleave within a group and require the weights to be
    bit-identical to a permuted-input run — sorted-order accumulation
    is partitioning- and input-order-invariant."""
    from cassandra_diff_spark.operators.curate import classifier_train

    rows = [(i, f"w{i % 7} tok{i % 3} alpha beta", i % 2) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    m1 = classifier_train(
        df, "doc_id", "text", "y", n_buckets=128, iters=3, n_groups=4
    )
    m2 = classifier_train(
        df.orderBy(F.rand(7)),
        "doc_id", "text", "y", n_buckets=128, iters=3, n_groups=4,
    )
    w1 = sorted((r["bucket"], r["weight_u"]) for r in m1.collect())
    w2 = sorted((r["bucket"], r["weight_u"]) for r in m2.collect())
    assert w1 == w2 and len(w1) > 0
