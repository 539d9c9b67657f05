"""canonical_url (functions/web.py): cross-engine canonicalization."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.web import canonical_url, canonical_url_sql

CASES = [
    # (raw, expected)
    ("https://Example.ORG/p/1", "https://example.org/p/1"),
    ("https://example.org:443/p/1", "https://example.org/p/1"),
    ("http://example.org:80/p/1", "http://example.org/p/1"),
    ("https://example.org:8443/p/1", "https://example.org:8443/p/1"),
    ("https://example.org/p/1#frag", "https://example.org/p/1"),
    ("https://example.org/p/1/", "https://example.org/p/1"),
    ("https://example.org/", "https://example.org/"),
    ("https://example.org", "https://example.org/"),
    (
        "https://example.org/p?b=2&a=1",
        "https://example.org/p?a=1&b=2",
    ),
    (
        "https://example.org/p?utm_source=x&a=1&gclid=99&fbclid=z",
        "https://example.org/p?a=1",
    ),
    ("https://example.org/p?utm_source=x", "https://example.org/p"),
    ("https://user:pw@example.org/p", "https://example.org/p"),
    ("not a url", None),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )


def test_canonicalization_cases(spark, urls_df):
    got = {
        r.i: r.c
        for r in urls_df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_sql_twin_bit_identical(spark, urls_df):
    got = [
        r.c
        for r in urls_df.select("i", canonical_url(F.col("url")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(
            "SELECT " + canonical_url_sql("v") + " FROM (SELECT ? AS v)",
            params=[raw],
        ).fetchone()[0]
        for raw, _ in CASES
    ]
    assert got == want


def test_two_crawls_one_key(spark):
    df = spark.createDataFrame(
        [
            (1, "https://News.Site/a/b/?utm_campaign=x#top"),
            (2, "https://news.site:443/a/b?"),
        ],
        "id long, url string",
    )
    keys = df.select(canonical_url(F.col("url")).alias("k")).distinct().count()
    assert keys == 1


def test_canonicalization_is_idempotent(spark, urls_df):
    """canonical(canonical(u)) == canonical(u) — the property that makes
    the key safe to store and re-derive."""
    once = urls_df.select(
        "i", canonical_url(F.col("url")).alias("c1")
    )
    twice = once.select("i", "c1", canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r.c2 == r.c1, (r.c1, r.c2)
