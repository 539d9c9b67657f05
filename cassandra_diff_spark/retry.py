"""Retry strategies for driver-side metadata writes.

Reference parity: RetryStrategy.java:28-81 (NoRetry + retry loop) and
ExponentialRetryStrategyProvider.java:32-121 (doubling pause from
``base_delay_ms``, total pause capped by ``total_delay_ms``). In the Spark
engine, *data-path* retries are Spark's task retry (spark.task.maxFailures);
this module only wraps journal/metadata IO — the same split the reference
makes between read retries and metadata best-effort writes
(JobMetadataDb.java:52-70).
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

from cassandra_diff_spark.config import RetryOptions

T = TypeVar("T")


class NoRetry:
    def retry(self, fn: Callable[[], T]) -> T:
        return fn()


class ExponentialRetry:
    """Pause sequence base, 2*base, 4*base... while cumulative pause
    <= total (ExponentialRetryStrategyProvider.java:97-119)."""

    def __init__(self, base_delay_ms: int, total_delay_ms: int):
        self.base_delay_ms = base_delay_ms
        self.total_delay_ms = total_delay_ms

    def pauses_ms(self) -> list[int]:
        out, total, cur = [], 0, self.base_delay_ms
        while total + cur <= self.total_delay_ms:
            out.append(cur)
            total += cur
            cur *= 2
        return out

    def retry(self, fn: Callable[[], T]) -> T:
        last: Exception | None = None
        for pause in [0] + self.pauses_ms():
            if pause:
                time.sleep(pause / 1000.0)
            try:
                return fn()
            except Exception as e:  # noqa: BLE001
                last = e
        raise last  # type: ignore[misc]


def strategy_for(opts: RetryOptions):
    """Reference: RetryStrategyProvider.create (RetryStrategyProvider.java:50-66)."""
    if opts.impl == "none":
        return NoRetry()
    if opts.impl == "exponential":
        return ExponentialRetry(opts.base_delay_ms, opts.total_delay_ms)
    raise ValueError(f"unknown retry impl {opts.impl!r}")
