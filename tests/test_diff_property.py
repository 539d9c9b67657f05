"""Property-based testing of the diff core: random (source, target) pairs
are diffed by the engine and by a pure-Python reimplementation of the
reference's exact algorithm (RangeComparator merge loop +
PartitionComparator zip walk). Any divergence on any generated input is a
semantics bug.

This goes beyond the reference's own example-based suites — hypothesis
shrinks failures to minimal counterexamples.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_diff_spark.model import DiffStats, TableSpec
from cassandra_diff_spark.operators.diff import build_diff

# rows: (pk, ck, v) — small domains force collisions, the interesting cases
row_strategy = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=3),
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
)
table_strategy = st.lists(row_strategy, min_size=0, max_size=12, unique=True)

SPEC = TableSpec(name="prop", partition_key=("pk",), clustering=("ck",))
REG = ["pk", "v"]  # regular = all minus clustering (pk included)


def reference_diff(src_rows, tgt_rows) -> DiffStats:
    """Pure-Python port of the reference algorithm: full-outer key merge
    (RangeComparator.java:106-166) + positional zip walk with fail-fast
    (PartitionComparator.java:51-84). Rows ordered by clustering key with
    full-row tiebreak, nulls first (the engine's documented ordering)."""

    def by_pk(rows):
        d = defaultdict(list)
        for r in rows:
            d[r[0]].append(r)
        nkey = lambda x: (0, 0) if x is None else (1, x)  # noqa: E731 — nulls FIRST
        for v in d.values():
            v.sort(key=lambda r: (nkey(r[1]), nkey(r[2])))
        return d

    s, t = by_pk(src_rows), by_pk(tgt_rows)
    st_ = DiffStats()
    for pk in set(s) | set(t):
        if pk not in t:
            st_.only_in_source += 1
            continue
        if pk not in s:
            st_.only_in_target += 1
            continue
        srows, trows = s[pk], t[pk]
        all_ck, m_rows, m_vals, x_vals = True, 0, 0, 0
        for srow, trow in zip(srows, trows):
            if srow[1] != trow[1]:  # clustering divergence -> abort
                all_ck = False
                break
            m_rows += 1
            for i, col in enumerate([0, 2]):  # regular cols: pk, v
                if srow[col] == trow[col]:
                    m_vals += 1
                else:
                    x_vals += 1
        else:
            if len(srows) != len(trows):
                all_ck = False
        if all_ck and x_vals == 0:
            st_.matched_partitions += 1
        else:
            st_.mismatched_partitions += 1
        st_.matched_rows += m_rows
        st_.matched_values += m_vals
        st_.mismatched_values += x_vals
    return st_


@pytest.mark.slow
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(src_rows=table_strategy, tgt_rows=table_strategy)
def test_positional_matches_reference_semantics(spark, src_rows, tgt_rows):
    schema = "pk int, ck int, v int"
    src = spark.createDataFrame(src_rows, schema) if src_rows else spark.createDataFrame([], schema)
    tgt = spark.createDataFrame(tgt_rows, schema) if tgt_rows else spark.createDataFrame([], schema)
    got = DiffStats.from_row(
        build_diff(src, tgt, SPEC, align="positional").stats.collect()[0]
    )
    exp = reference_diff(src_rows, tgt_rows)
    assert got == exp, f"src={src_rows} tgt={tgt_rows}"


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(src_rows=table_strategy, tgt_rows=table_strategy)
def test_set_equals_positional_on_unique_keys(spark, src_rows, tgt_rows):
    """Metamorphic: with unique (pk, ck) per side — the Cassandra data
    model — set alignment and positional alignment must agree exactly."""

    def dedupe(rows):
        seen, out = set(), []
        for r in rows:
            if (r[0], r[1]) not in seen:
                seen.add((r[0], r[1]))
                out.append(r)
        return out

    src_rows, tgt_rows = dedupe(src_rows), dedupe(tgt_rows)
    schema = "pk int, ck int, v int"
    src = spark.createDataFrame(src_rows, schema) if src_rows else spark.createDataFrame([], schema)
    tgt = spark.createDataFrame(tgt_rows, schema) if tgt_rows else spark.createDataFrame([], schema)
    pos = DiffStats.from_row(build_diff(src, tgt, SPEC, align="positional").stats.collect()[0])
    st = DiffStats.from_row(build_diff(src, tgt, SPEC, align="set").stats.collect()[0])
    # set mode re-aligns after divergence, so counted rows/values can only
    # be >= positional's fail-fast prefix; classifications agree exactly
    assert (
        st.matched_partitions,
        st.mismatched_partitions,
        st.only_in_source,
        st.only_in_target,
    ) == (
        pos.matched_partitions,
        pos.mismatched_partitions,
        pos.only_in_source,
        pos.only_in_target,
    ), f"src={src_rows} tgt={tgt_rows}"
    assert st.matched_rows >= pos.matched_rows
