"""Relational + pipeline operators (diff core, dedup, similarity, ...).

Cache discipline: several LSH/sketch operators ``.cache()`` an
intermediate frame that feeds multiple plan branches (without
materialization every branch re-runs the sketch computation). In a
one-shot job the caches die with the session; a LONG-LIVED session
(e.g. ``http_api --serve``) should call :func:`release_caches` after
materializing each result, or cached blocks accumulate until eviction.
"""

from pyspark.sql import DataFrame

#: Frames cached by operators in this package, in cache order.
_LIVE_CACHES: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the frame so :func:`release_caches` can
    drop it once the consuming plan has been materialized."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every operator-cached frame; returns how many were
    released. Safe to call at any time — Spark recomputes an unpersisted
    branch if a plan still needs it (correctness is unaffected; only the
    sharing is lost)."""
    n = len(_LIVE_CACHES)
    for df in _LIVE_CACHES:
        df.unpersist()
    _LIVE_CACHES.clear()
    return n
