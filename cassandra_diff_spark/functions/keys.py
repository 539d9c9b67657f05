"""Token (partition hash), token filters, and deterministic pair-consistent
sampling — all as Catalyst Column expressions (JVM-side, codegen'd).

Reference parity:
  * token(pk...)            — TokenHelper.java:24-68 (Murmur3 ring). We use
    xxhash64 by default: ring *compatibility* is not required for
    self-consistent diffing (SURVEY.md §2.7 F1), only a stable total order.
  * SpecificTokens filter   — SpecificTokens.java:44-52 (ACCEPT / REJECT).
  * probabilistic sampling  — Differ.shouldIncludePartition,
    Differ.java:241-252. The reference seeds java.util.Random with the
    job id; independently sampling each side would diverge, so we use a
    hash-mod predicate on the key + seed applied identically to both sides
    (deterministic, join-safe, distributed).
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth multiplicative constant — used by the arithmetic token so the same
#: token is computable in plain ANSI SQL by external oracles (e.g. DuckDB).
_KNUTH = 2654435761
_MERSENNE = 2305843009213693951  # 2^61 - 1


def token_expr(pk_cols: Sequence[str]) -> Column:
    """Default token: xxhash64 over the partition-key columns.

    64-bit, JVM-side, consistent across executors — the engine's analog of
    the Murmur3 token ring [Long.MIN, Long.MAX].
    """
    return F.xxhash64(*[F.col(c) for c in pk_cols])


def arithmetic_token(pk_col: str) -> Column:
    """Order-scrambling token computable identically in any SQL engine:
    ``(pk * 2654435761) % (2^61 - 1)``.

    Used where an external SQL oracle must reproduce token values exactly
    (integer-only arithmetic, no overflow for keys < ~3.4e9).
    """
    return (F.col(pk_col).cast("bigint") * F.lit(_KNUTH)) % F.lit(_MERSENNE)


def arithmetic_token_sql(pk_col: str) -> str:
    """ANSI-SQL text of :func:`arithmetic_token` for oracle queries."""
    return f"(CAST({pk_col} AS BIGINT) * {_KNUTH}) % {_MERSENNE}"


def token_range_predicate(token: Column, start: int | None, end: int | None) -> Column:
    """Half-open range ``start < token <= end``
    (reference: DiffCluster.java:226-227)."""
    pred = F.lit(True)
    if start is not None:
        pred = pred & (token > F.lit(start))
    if end is not None:
        pred = pred & (token <= F.lit(end))
    return pred


def specific_tokens_predicate(
    token: Column, tokens: Iterable[int], mode: str = "ACCEPT"
) -> Column:
    """SpecificTokens ACCEPT/REJECT filter
    (reference: SpecificTokens.java:44-52)."""
    isin = token.isin([int(t) for t in tokens])
    if mode.upper() == "ACCEPT":
        return isin
    if mode.upper() == "REJECT":
        return ~isin
    raise ValueError(f"mode must be ACCEPT or REJECT, got {mode!r}")


def sample_predicate(token: Column, fraction: float, seed: int) -> Column:
    """Deterministic pair-consistent Bernoulli(fraction) sampling on the
    partition token (reference: Differ.java:241-252; determinism asserted by
    DifferTest.java:74-82).

    Applied identically to source and target so the sampled key sets agree.
    Resolution 1e-6.
    """
    if not (0.0 < fraction <= 1.0):
        # reference validates the same range: Differ.java:243-245
        raise ValueError(f"sampling fraction must be in (0, 1], got {fraction}")
    k = 1_000_000
    bucket = F.pmod(F.xxhash64(token, F.lit(int(seed))), F.lit(k))
    return bucket < F.lit(int(round(fraction * k)))


def pk_equality_predicate(df_cols: dict[str, Column], values: dict[str, object]) -> Column:
    """Composite-PK equality (reference: DiffCluster.java:247-248)."""
    return reduce(
        lambda a, b: a & b,
        [df_cols[c].eqNullSafe(F.lit(v)) for c, v in values.items()],
    )
