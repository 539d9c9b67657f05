"""Text-analysis expressions for the training-data pipeline surface:
tokenization, shingling, cross-engine hashing, fingerprinting, quality
metrics, language-ID scoring.

All hot-path expressions are built-in Catalyst functions (JVM-side,
codegen'd) — no Python UDFs. Every function has an ANSI-SQL twin
(``*_sql``) so external oracles (DuckDB) can reproduce values bit-for-bit.

Cross-engine hash: ``md5_hash64`` takes the first 15 hex digits of MD5 as a
60-bit non-negative integer — identical in any engine with md5() and hex
parsing; used as the base hash for minhash/simhash so those sketches are
oracle-checkable (unlike xxhash64, which is Spark-private).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ----------------------------------------------------------------- hashing

def md5_hash64(col: Column) -> Column:
    """First 15 hex digits of md5 as a 60-bit BIGINT (cross-engine)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ------------------------------------------------------------ tokenization

def words(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    return F.split(F.trim(col), r"\s+")


def words_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


def n_words(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(words(col))
    ).cast("long")


def n_words_sql(expr: str) -> str:
    return (
        f"CAST(CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE len({words_sql(expr)}) END AS BIGINT)"
    )


def shingles_from_words(w: Column, n: int) -> Column:
    """n-word shingles from an ALREADY-MATERIALIZED words-array column.

    Callers must project the words array into its own column first —
    passing ``words(text)`` inline re-evaluates the regex split once per
    element_at reference (no CSE inside lambda bodies), measured 8-16x
    slower over the documents corpus. element_at beats slice+concat_ws
    another ~2.5x (no subarray allocation per shingle).
    """
    return F.when(F.size(w) < n, F.array(F.concat_ws(" ", w))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + off) for off in range(n)]
            ),
        )
    )


def word_shingles(col: Column, n: int) -> Column:
    """Array of n-word shingles of a raw text column; fewer than n words
    -> the whole text as one shingle (so short docs still fingerprint).
    Prefer materializing :func:`words` and using
    :func:`shingles_from_words` in hot paths (see its perf note)."""
    return shingles_from_words(words(col), n)


def word_shingles_sql(expr: str, n: int) -> str:
    w = words_sql(expr)
    return (
        f"CASE WHEN len({w}) < {n} THEN [array_to_string({w}, ' ')] "
        f"ELSE [array_to_string(({w})[i:i+{n - 1}], ' ') "
        f"      for i in range(1, len({w}) - {n - 2})] END"
    )


# ------------------------------------------------------------- fingerprint

def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------- quality

_PUNCT = r"[.,!?;:]"

def n_punct(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, _PUNCT, ""))).cast("long")


def n_punct_sql(expr: str) -> str:
    return (
        f"CAST(length({expr}) - length(regexp_replace({expr}, '{_PUNCT}', '', 'g')) "
        f"AS BIGINT)"
    )


#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic (deterministic scoring, not a trained model)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list."""
    w = words(F.lower(col))
    return F.size(F.filter(w, lambda t: t.isin(*stopwords))).cast("long")


def stopword_hits_sql(expr: str, stopwords: list[str]) -> str:
    lst = ", ".join(f"'{s}'" for s in stopwords)
    return (
        f"CAST(len(list_filter({words_sql(f'lower({expr})')}, "
        f"t -> list_contains([{lst}], t))) AS BIGINT)"
    )


def langid(col: Column) -> Column:
    """Pick the language whose stopword list scores highest; ties broken by
    fixed language order (earlier in STOPWORDS wins); zero hits -> 'und'.

    Explicit argmax-as-CASE so the SQL twin evaluates identically.
    """
    langs = list(STOPWORDS)
    scores = {lg: stopword_hits(col, sw) for lg, sw in STOPWORDS.items()}
    e = F.lit("und")
    for lg in reversed(langs):
        others_before = langs[: langs.index(lg)]
        cond = (scores[lg] > F.lit(0))
        for o in others_before:
            cond = cond & (scores[lg] > scores[o])
        for o in langs[langs.index(lg) + 1 :]:
            cond = cond & (scores[lg] >= scores[o])
        e = F.when(cond, F.lit(lg)).otherwise(e)
    return e


def langid_sql(expr: str) -> str:
    langs = list(STOPWORDS)
    s = {lg: stopword_hits_sql(expr, sw) for lg, sw in STOPWORDS.items()}
    clauses = []
    for lg in langs:
        others_before = langs[: langs.index(lg)]
        conds = [f"{s[lg]} > 0"]
        conds += [f"{s[lg]} > {s[o]}" for o in others_before]
        conds += [f"{s[lg]} >= {s[o]}" for o in langs[langs.index(lg) + 1 :]]
        clauses.append("WHEN " + " AND ".join(conds) + f" THEN '{lg}'")
    # evaluated top-down: first matching lang wins, same as the Spark fold
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


# ------------------------------------------------------- BPE-ish tokenizing

#: Pre-tokenization pattern BPE vocabularies are trained over: letter
#: runs, SINGLE digits (GPT-style digit splitting), single non-space
#: punctuation. Restricted to constructs Java regex and RE2/DuckDB
#: interpret identically (no lookahead, no \p classes).
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_tokens(col: Column) -> Column:
    """array<string> of BPE-ish pre-tokens of a text column."""
    return F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0))


def n_bpe_tokens(col: Column) -> Column:
    """BPE-ish token count — the cost estimator a training-data pipeline
    budgets corpus size with (whitespace words undercount punctuated
    text; this splits punctuation and digits the way BPE pre-tokenizers
    do)."""
    return F.size(bpe_tokens(col)).cast("long")


def n_bpe_tokens_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_PATTERN}')) AS BIGINT)"


# --------------------------------------------------------- quality scoring

def quality_milli(col: Column) -> Column:
    """Composite document-quality score (the keep/drop signal a pretrain
    pipeline filters on), in exact integer milli-units: stopword density
    + length band + punctuation sanity, averaged. All-Catalyst; the SQL
    twin (quality_milli_sql) is the same integer arithmetic. Divisions
    are FLOORED before any further arithmetic so Spark matches DuckDB's
    integer ``//`` exactly."""
    nw = n_words(col)
    sw = stopword_hits(col, STOPWORDS["en"])
    np_ = n_punct(col)
    stop_density = F.when(
        nw > 0, F.least(F.floor(sw * 5000 / nw), F.lit(1000))
    ).otherwise(0)
    length_band = F.when((nw >= 20) & (nw <= 5000), 1000).otherwise(
        F.when(nw > 0, 300).otherwise(0)
    )
    punct_sanity = F.when(
        nw > 0, F.greatest(F.lit(0), 1000 - F.floor(np_ * 2000 / nw))
    ).otherwise(0)
    return F.floor(
        (stop_density.cast("long") + length_band.cast("long") + punct_sanity.cast("long"))
        / 3
    ).cast("long")


def quality_milli_sql(expr: str) -> str:
    nw = n_words_sql(expr)
    sw = stopword_hits_sql(expr, STOPWORDS["en"])
    np_ = n_punct_sql(expr)
    stop_density = f"CASE WHEN {nw} > 0 THEN LEAST({sw} * 5000 // {nw}, 1000) ELSE 0 END"
    length_band = (
        f"CASE WHEN {nw} >= 20 AND {nw} <= 5000 THEN 1000 "
        f"WHEN {nw} > 0 THEN 300 ELSE 0 END"
    )
    punct_sanity = f"CASE WHEN {nw} > 0 THEN GREATEST(0, 1000 - {np_} * 2000 // {nw}) ELSE 0 END"
    return f"CAST((({stop_density}) + ({length_band}) + ({punct_sanity})) // 3 AS BIGINT)"


# ----------------------------------------------------------- PII handling

#: Detection patterns shared by the Spark and SQL paths. Kept to syntax
#: that Java regex and RE2 (DuckDB) interpret identically: character
#: classes, bounded repetition, \b word boundaries — no lookaround (RE2
#: has none) and no leftmost-longest ambiguity.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

#: Replacement tokens, applied in a fixed order (email first: an address
#: can contain digit runs a later pattern would otherwise split).
PII_REDACTIONS: tuple[tuple[str, str], ...] = (
    ("email", "[EMAIL]"),
    ("ipv4", "[IP]"),
    ("phone", "[PHONE]"),
)


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII pattern — JVM-side regexp_extract_all."""
    return F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), F.lit(0))).cast(
        "long"
    )


def pii_count_sql(expr: str, kind: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{PII_PATTERNS[kind]}')) AS BIGINT)"


def pii_redact(col: Column) -> Column:
    """Replace every PII match with its placeholder token, in the fixed
    PII_REDACTIONS order (Spark regexp_replace replaces all matches)."""
    out = col
    for kind, token in PII_REDACTIONS:
        out = F.regexp_replace(out, PII_PATTERNS[kind], token.replace("$", r"\$"))
    return out


def pii_redact_sql(expr: str) -> str:
    out = expr
    for kind, token in PII_REDACTIONS:
        out = f"regexp_replace({out}, '{PII_PATTERNS[kind]}', '{token}', 'g')"
    return out


# ------------------------------------------------------------- scripts

#: Unicode script ranges as \x{...} literals — the ONE hex-escape syntax
#: Java regex and RE2 share, so the identical pattern string runs in
#: Spark and DuckDB. Counting is length-difference after deleting the
#: class (both engines count code points), so every count is an exact
#: integer. Order matters: `script_dominant` breaks ties by first-listed.
SCRIPT_RANGES = (
    ("latin", r"[A-Za-z\x{00C0}-\x{024F}]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
    ("devanagari", r"[\x{0900}-\x{097F}]"),
    ("digit", r"[0-9]"),
)


def script_count(col: Column, pattern: str) -> Column:
    """Exact count of characters matching a one-char class: length
    difference after deleting the class. JVM-side, no Python."""
    return (
        F.length(col) - F.length(F.regexp_replace(col, pattern, ""))
    ).cast("long")


def script_count_sql(expr: str, pattern: str) -> str:
    p = pattern.replace("'", "''")
    return (
        f"CAST(length({expr}) - length(regexp_replace({expr}, '{p}', '', 'g'))"
        f" AS BIGINT)"
    )


def script_dominant(col: Column) -> Column:
    """Name of the script with the most characters (ties: first in
    SCRIPT_RANGES, 'digit' excluded; all-zero -> 'none'). Explicit
    argmax-as-CASE, same shape as ``langid`` so the SQL twin evaluates
    identically."""
    names = [n for n, _ in SCRIPT_RANGES if n != "digit"]
    counts = {n: script_count(col, p) for n, p in SCRIPT_RANGES if n != "digit"}
    e = F.lit("none")
    for n in reversed(names):
        before = names[: names.index(n)]
        cond = counts[n] > 0
        for o in before:
            cond = cond & (counts[n] > counts[o])
        for o in names[names.index(n) + 1:]:
            cond = cond & (counts[n] >= counts[o])
        e = F.when(cond, F.lit(n)).otherwise(e)
    return e


def script_dominant_sql(expr: str) -> str:
    names = [n for n, _ in SCRIPT_RANGES if n != "digit"]
    cnt = {
        n: script_count_sql(expr, p) for n, p in SCRIPT_RANGES if n != "digit"
    }
    out = "'none'"
    for n in reversed(names):
        before = names[: names.index(n)]
        conds = [f"{cnt[n]} > 0"]
        conds += [f"{cnt[n]} > {cnt[o]}" for o in before]
        conds += [f"{cnt[n]} >= {cnt[o]}" for o in names[names.index(n) + 1:]]
        out = f"CASE WHEN {' AND '.join(conds)} THEN '{n}' ELSE {out} END"
    return out



# ------------------------------------------------------------- mojibake

def mojibake_marks(col: Column) -> Column:
    """Count of encoding-damage markers — the CCNet-style signal for
    text that survived a bad UTF-8/Latin-1 round trip: U+FFFD
    replacement characters plus the classic double-decode artifact
    leads ('Ã', 'Â', 'â€'). Exact integer count (length differences —
    no regex extraction); callers ratio it per char/word like the other
    counter primitives (n_punct, stopword_hits). A HINT, not a decoder:
    byte-level fixing happens upstream; this flags what slipped
    through, map-only."""
    singles = F.length(col) - F.length(F.regexp_replace(col, "[\uFFFD\u00C3\u00C2]", ""))
    pairs = (
        F.length(col) - F.length(F.regexp_replace(col, "\u00E2\u20AC", ""))
    ) / F.lit(2)
    return (singles + pairs).cast("long")


def mojibake_marks_sql(expr: str) -> str:
    return (
        f"CAST((length({expr}) - length(regexp_replace({expr}, "
        f"'[\uFFFD\u00C3\u00C2]', '', 'g')))"
        f" + (length({expr}) - length(regexp_replace({expr}, "
        f"'\u00E2\u20AC', '', 'g'))) // 2 AS BIGINT)"
    )


# ------------------------------------------------- Unicode normalization

def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (UAX #15): composed/decomposed
    spellings of the same text ("e" + U+0301 vs precomposed "é") become
    byte-identical, so downstream EXACT operators — fingerprint dedup,
    vocabulary build, groupBy text — stop treating them as distinct.
    This is the missing first step of a text-dedup pipeline on crawled
    data, where both spellings are common.

    ``form``: NFC (canonical composition — the safe default; ligatures
    and width variants are PRESERVED) or NFKC (compatibility folding —
    "ﬁ" -> "fi", fullwidth -> ASCII; lossy, opt in deliberately).

    Spark SQL has no normalization builtin, so this is an Arrow-batched
    pandas_udf. The per-string work is ``unicodedata.normalize`` —
    DELIBERATELY not ``pyarrow.compute.utf8_normalize``: this
    environment's Arrow build (16.1) returns DECOMPOSED output for
    form=NFC/NFKC (identical bytes to NFD/NFKD — the composition pass
    never runs), so routing through it would corrupt every precomposed
    character. Verified: ``utf8_normalize(["café"], form="NFC")`` yields
    ``65 301``, not ``e9``. What Arrow IS trusted for here is the
    vectorized ``string_is_ascii`` prefilter: ASCII is a fixed point of
    all four forms (no decompositions, all starters), and crawl text is
    mostly ASCII, so the Python loop only touches the non-ASCII slice.
    NFC is bit-identical to DuckDB's ``nfc_normalize`` (both implement
    the Unicode standard), which is what the gate oracle uses; NULL in
    -> NULL out."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(s, type=pa.string())
        is_ascii = pc.string_is_ascii(arr)
        # non-ASCII, non-null rows are the only ones normalization can
        # change; everything else passes through untouched
        need = pc.fill_null(pc.invert(is_ascii), False).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        if not need.any():
            return s
        out = s.copy()
        idx = s.index[np.asarray(need)]
        out.loc[idx] = [unicodedata.normalize(form, v) for v in s.loc[idx]]
        return out

    return norm(col)


def collapse_whitespace(col: Column) -> Column:
    """Trim + collapse runs of whitespace to single spaces — the other
    half of text canonicalization before exact dedup. Pure JVM
    (regexp_replace), same regex the SQL twin uses."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def collapse_whitespace_sql(expr: str) -> str:
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"
