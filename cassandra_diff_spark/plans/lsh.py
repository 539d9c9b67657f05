"""LSH band planning — choose (bands, rows-per-band) BEFORE paying for
the corpus pass, from the closed-form S-curve: a pair with Jaccard
similarity ``s`` collides in at least one band with probability
``1 - (1 - s^r)^b``. The planner enumerates the divisor splits of the
signature length, reports each split's catch curve in exact milli
units, and recommends the split whose 50%-catch point sits closest to
the caller's target threshold.

This is the a-priori half of threshold tuning; the a-posteriori half is
:func:`~cassandra_diff_spark.operators.evaluate.pair_metrics` over a
labeled sample. Pure planning arithmetic — no SparkSession, no data —
in the same artifact style as :mod:`cassandra_diff_spark.plans.advisor`.
"""

from __future__ import annotations

from dataclasses import dataclass


def catch_probability_milli(bands: int, rows: int, s_milli: int) -> int:
    """P(candidate pair) in milli units for a pair of Jaccard
    similarity ``s_milli``/1000 under (bands, rows) banding."""
    if not (0 <= s_milli <= 1000):
        raise ValueError(f"s_milli must be in [0, 1000], got {s_milli}")
    s = s_milli / 1000.0
    return round((1.0 - (1.0 - s**rows) ** bands) * 1000)


def curve_threshold_milli(bands: int, rows: int) -> int:
    """The S-curve's characteristic threshold ``(1/b)^(1/r)`` in milli
    units — the similarity at which catch probability crosses ~0.63;
    pairs meaningfully above it are near-certain candidates, pairs
    meaningfully below near-certain misses."""
    return round(((1.0 / bands) ** (1.0 / rows)) * 1000)


@dataclass(frozen=True)
class BandPlan:
    bands: int
    rows: int
    threshold_milli: int          # (1/b)^(1/r)
    catch_at_target_milli: int    # P(candidate) at the caller's target
    curve: "tuple[tuple[int, int], ...]"  # (s_milli, catch_milli) samples


def band_plan(
    n_perm: int,
    target_milli: int,
    *,
    curve_points: "tuple[int, ...]" = (300, 500, 700, 800, 900, 950),
) -> "list[BandPlan]":
    """All divisor splits of an ``n_perm``-hash signature, best first.

    "Best" = characteristic threshold closest to ``target_milli``, tie
    to MORE bands (recall over candidate volume — false positives are
    verified away downstream, false negatives are gone forever: the
    asymmetry every dedup pipeline lives with). The full list is
    returned so the caller can trade toward fewer candidates when the
    verify stage is the bottleneck.

    Sanity anchor: the engine's default (NUM_PERM=16, BANDS=4 — see
    operators/dedup.py) has threshold (1/4)^(1/4) ≈ 707 milli, the
    ~0.7-Jaccard near-dup regime the gates exercise.
    """
    if n_perm < 2:
        raise ValueError(f"n_perm must be >= 2, got {n_perm}")
    if not (0 < target_milli < 1000):
        raise ValueError(f"target_milli must be in (0, 1000), got {target_milli}")
    plans = []
    for bands in range(1, n_perm + 1):
        if n_perm % bands:
            continue
        rows = n_perm // bands
        if rows < 1 or bands < 1 or (bands == 1 and rows == 1):
            continue
        plans.append(
            BandPlan(
                bands=bands,
                rows=rows,
                threshold_milli=curve_threshold_milli(bands, rows),
                catch_at_target_milli=catch_probability_milli(
                    bands, rows, target_milli
                ),
                curve=tuple(
                    (s, catch_probability_milli(bands, rows, s))
                    for s in curve_points
                ),
            )
        )
    plans.sort(
        key=lambda p: (abs(p.threshold_milli - target_milli), -p.bands)
    )
    return plans
