"""Data model: table specs, splits, and the 9-counter diff statistics.

Mirrors the reference's abstractions (SURVEY.md §1.1):
  * TableSpec — column roles; ``regular`` columns are ALL columns minus the
    clustering columns, so they INCLUDE the partition-key columns
    (reference: spark-job/.../TableSpec.java:84-87 — this is why the README
    demo counts 6,000 matched values for 1,000 six-column rows).
  * Split — contiguous token sub-range (reference: DiffJob.java:275-303).
  * DiffStats / STAT_FIELDS — the 9 counters of RangeStats
    (reference: RangeStats.java:31-39).
"""

from __future__ import annotations

from dataclasses import dataclass, field


#: The 9 counters of the reference's RangeStats (RangeStats.java:31-39),
#: in a stable order used by every stats DataFrame this engine produces.
STAT_FIELDS: tuple[str, ...] = (
    "matched_partitions",
    "mismatched_partitions",
    "error_partitions",
    "skipped_partitions",
    "only_in_source",
    "only_in_target",
    "matched_rows",
    "matched_values",
    "mismatched_values",
)


@dataclass(frozen=True)
class TableSpec:
    """Column roles for one diffed table.

    partition_key: identity of a partition (token = hash of these).
    clustering:    within-partition ordering; compared for row alignment
                   (reference: PartitionComparator.java:102-114).
    regular:       value-compared columns. Defaults to all columns minus
                   clustering — i.e. partition keys ARE counted
                   (reference: TableSpec.java:84-87).
    """

    name: str
    partition_key: tuple[str, ...]
    clustering: tuple[str, ...] = ()
    regular: tuple[str, ...] | None = None

    def regular_columns(self, all_columns: list[str]) -> tuple[str, ...]:
        if self.regular is not None:
            return self.regular
        return tuple(c for c in all_columns if c not in self.clustering)

    def validate_against(self, src_cols: list[str], tgt_cols: list[str]) -> None:
        """Name-level schema compatibility check
        (reference: Differ.validateTableSpecs, Differ.java:287-291)."""
        if list(src_cols) != list(tgt_cols):
            raise ValueError(
                f"table {self.name}: source/target schemas differ by name: "
                f"{src_cols} vs {tgt_cols}"
            )
        missing = [
            c
            for c in (*self.partition_key, *self.clustering)
            if c not in src_cols
        ]
        if missing:
            raise ValueError(f"table {self.name}: key columns missing: {missing}")


@dataclass(frozen=True)
class Split:
    """Contiguous half-open token range (start, end]
    (reference: DiffJob.java:275-303)."""

    split_number: int
    bucket: int
    start: int
    end: int


@dataclass
class DiffStats:
    """Driver-side materialization of one stats row (all 9 counters)."""

    matched_partitions: int = 0
    mismatched_partitions: int = 0
    error_partitions: int = 0
    skipped_partitions: int = 0
    only_in_source: int = 0
    only_in_target: int = 0
    matched_rows: int = 0
    matched_values: int = 0
    mismatched_values: int = 0

    def accumulate(self, other: "DiffStats") -> "DiffStats":
        """Commutative merge (reference: RangeStats.java:167-178)."""
        for f in STAT_FIELDS:
            setattr(self, f, getattr(self, f) + getattr(other, f))
        return self

    @property
    def all_matches(self) -> bool:
        """Job-success predicate (reference: RangeStats.java:181-185):
        skipped_partitions must be 0 too — a run that skipped partitions
        via token filters is not a verified full match. Deliberate
        deviation from the reference: ``mismatched_partitions == 0`` is
        ALSO required here (the reference omits it, relying on
        mismatched_values to catch those; we check both for safety)."""
        return (
            self.mismatched_partitions == 0
            and self.error_partitions == 0
            and self.skipped_partitions == 0
            and self.only_in_source == 0
            and self.only_in_target == 0
            and self.mismatched_values == 0
        )

    @classmethod
    def from_row(cls, row) -> "DiffStats":
        return cls(**{f: row[f] for f in STAT_FIELDS})
