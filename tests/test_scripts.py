"""functions/text script profiling: exact counts + dominant-script CASE,
DuckDB bit-parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.text import (
    SCRIPT_RANGES,
    script_count,
    script_count_sql,
    script_dominant,
    script_dominant_sql,
)

CASES = [
    ("hello world", {"latin": 10}, "latin"),
    ("Привет мир", {"cyrillic": 9}, "cyrillic"),
    ("日本語テキスト한국어", {"cjk": 10}, "cjk"),
    ("مرحبا", {"arabic": 5}, "arabic"),
    ("नमस्ते", {"devanagari": 6}, "devanagari"),
    ("αβγ δε", {"greek": 5}, "greek"),
    ("abc Привет", {"latin": 3, "cyrillic": 6}, "cyrillic"),
    ("ab кг", {"latin": 2, "cyrillic": 2}, "latin"),  # tie -> first listed
    ("12345 67", {"digit": 7}, "none"),
    ("", {}, "none"),
    ("éàü Çño", {"latin": 6}, "latin"),  # Latin-1/Extended block
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "i long, t string"
    )


def test_counts_and_dominant(spark, sdf):
    cols = [script_count(F.col("t"), p).alias(f"n_{n}") for n, p in SCRIPT_RANGES]
    out = {
        r.i: r
        for r in sdf.select("i", *cols, script_dominant(F.col("t")).alias("dom")).collect()
    }
    for i, (raw, counts, dom) in enumerate(CASES):
        for n, _ in SCRIPT_RANGES:
            assert out[i][f"n_{n}"] == counts.get(n, 0), (raw, n)
        assert out[i].dom == dom, raw


def test_duckdb_bit_parity(spark, sdf):
    got = [
        tuple(r)
        for r in sdf.select(
            "i",
            *[script_count(F.col("t"), p).alias(f"n_{n}") for n, p in SCRIPT_RANGES],
            script_dominant(F.col("t")).alias("dom"),
        ).orderBy("i").collect()
    ]
    con = duckdb.connect()
    cols = ", ".join(f"{script_count_sql('t', p)} AS n_{n}" for n, p in SCRIPT_RANGES)
    want = []
    for i, (raw, _, _) in enumerate(CASES):
        row = con.sql(
            f"SELECT {i} AS i, {cols}, {script_dominant_sql('t')} AS dom "
            "FROM (SELECT ? AS t)",
            params=[raw],
        ).fetchone()
        want.append(tuple(row))
    assert got == want
