"""functions/web.strip_html — markup-to-text extraction cases + DuckDB
bit-parity of the SQL twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.functions.web import strip_html, strip_html_sql

CASES = [
    # (raw html, expected text)
    ("<p>hello <b>world</b></p>", "hello world"),
    ("a<br/>b", "a b"),
    # script/style bodies vanish entirely, including '<' inside code
    ('<script>if (1 < 2) { alert("x"); }</script>after', "after"),
    ("<style>p { color: red }</style>text", "text"),
    ("<SCRIPT TYPE='a'>x</SCRIPT>ok", "ok"),  # case-insensitive
    # comments drop first, even when they hide a tag
    ("keep<!-- <div>hidden</div> -->me", "keep me"),
    # entities: the dominant six; &amp; decodes LAST
    ("&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp;", "<tag> \"q\" 's' a b &"),
    ("&amp;lt;", "&lt;"),  # single-pass decode, not recursive
    # attributes with '>' edge: tag ends at first '>'
    ('<a href="u">link</a>', "link"),
    # whitespace collapse + trim
    ("  <p>\n\n a \t b \r\n </p>  ", "a b"),
    # multiline script (the (?s) flag)
    ("<script>\nvar x = 1;\nvar y = 2;\n</script>done", "done"),
    # plain text with stray '<' not forming a tag survives as-is when no
    # closing '>' follows
    ("1 < 2 and done", "1 < 2 and done"),
    ("", ""),
]


@pytest.fixture(scope="module")
def html_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, h string"
    )


def test_extraction_cases(spark, html_df):
    got = {
        r.i: r.c for r in html_df.select("i", strip_html(F.col("h")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_sql_twin_bit_identical(spark, html_df):
    got = [
        r.c
        for r in html_df.select("i", strip_html(F.col("h")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(
            "SELECT " + strip_html_sql("v") + " FROM (SELECT ? AS v)",
            params=[raw],
        ).fetchone()[0]
        for raw, _ in CASES
    ]
    assert got == want


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i long, h string")
    assert df.select(strip_html(F.col("h")).alias("c")).collect()[0].c is None


def test_no_python_in_plan(spark, html_df):
    plan = (
        html_df.select(strip_html(F.col("h")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestUnicodeNormalize:
    def test_nfc_composes_and_preserves_ligatures(self, spark):
        from cassandra_diff_spark.functions.text import (
            collapse_whitespace,
            unicode_normalize,
        )
        from pyspark.sql import functions as F

        rows = [
            (1, "café"),      # decomposed -> composed
            (2, "café"),       # already composed: unchanged
            (3, "ﬁne   print"),  # ligature preserved by NFC; ws collapses
            (4, None),
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {
            r.id: r.n
            for r in df.select(
                "id",
                collapse_whitespace(unicode_normalize(F.col("t"))).alias("n"),
            ).collect()
        }
        assert got[1] == got[2] == "café"
        assert got[3] == "ﬁne print"  # NFC must NOT fold the ligature
        assert got[4] is None

    def test_nfkc_folds_compatibility_forms(self, spark):
        from cassandra_diff_spark.functions.text import unicode_normalize
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "ﬁne ＡＢ 2³")], "id long, t string"
        )
        (r,) = df.select(unicode_normalize(F.col("t"), "NFKC").alias("n")).collect()
        assert r.n == "fine AB 23"  # ligature, fullwidth, superscript folded

    def test_unknown_form_rejected(self, spark):
        import pytest

        from cassandra_diff_spark.functions.text import unicode_normalize
        from pyspark.sql import functions as F

        with pytest.raises(ValueError, match="normalization form"):
            unicode_normalize(F.col("x"), "NFX")

    def test_ascii_fast_path_and_all_forms_match_unicodedata(self, spark):
        """The pandas_udf skips the Python loop for ASCII rows via
        Arrow's string_is_ascii — correctness requires ASCII be a fixed
        point of every form (it is: no decompositions, all starters).
        Mixed ASCII/non-ASCII/null batches must agree with a plain
        unicodedata map in all four forms, including NFKC."""
        import unicodedata

        from pyspark.sql import functions as F

        from cassandra_diff_spark.functions.text import unicode_normalize

        rows = [
            (1, "plain ascii only"),
            (2, "café"),        # decomposed e + U+0301
            (3, "Ｆｕｌｌ ﬁn"),  # compat forms: NFKC/NFKD fold, NFC/NFD keep
            (4, None),
            (5, ""),
            (6, "각"),           # hangul jamo -> syllable under NFC
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        for form in ("NFC", "NFKC", "NFD", "NFKD"):
            got = {
                r.id: r.n
                for r in df.select(
                    "id", unicode_normalize(F.col("t"), form).alias("n")
                ).collect()
            }
            for i, t in rows:
                want = unicodedata.normalize(form, t) if t is not None else None
                assert got[i] == want, (form, i, got[i], want)

    def test_env_arrow_utf8_normalize_is_still_broken(self):
        """Guard for the r7 advice to route NFC through
        pyarrow.compute.utf8_normalize: THIS Arrow build never runs the
        composition pass (NFC output == NFD output), so unicode_normalize
        must keep using unicodedata. If this test ever fails, the Arrow
        kernel got fixed and the pandas_udf body can switch to it."""
        import pyarrow as pa
        import pyarrow.compute as pc

        out = pc.utf8_normalize(pa.array(["café"]), form="NFC").to_pylist()[0]
        assert out != "café" and [hex(ord(c)) for c in out] == ["0x63", "0x61", "0x66", "0x65", "0x301"]
