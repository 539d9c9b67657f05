"""Typed error attribution (ST6) — the engine's analog of the
reference's ClusterSourcedException (common/.../ClusterSourcedException
.java:11-31): the SIDE that failed travels as a field on the exception,
never inferred from message text (a path or table name containing the
word "target" must not flip the attribution).
"""

from __future__ import annotations


class SourceTaggedError(RuntimeError):
    """An error tagged with the diff side that produced it.

    ``source`` is "SOURCE" or "TARGET"; the original exception is both
    chained (``__cause__``) and kept as ``cause``.
    """

    def __init__(self, source: str, cause: Exception):
        super().__init__(f"[{source}] {cause}")
        self.source = source
        self.cause = cause
