"""The standing three-scale oracle sweep (VERDICT r8 #7): every
oracle-paired gate, bit-exact, at sf0.001 AND sf0.01 AND sf0.1.

Why it exists: r8's ad-hoc sweep caught two REAL bugs invisible at the
driver's scale — ``time_weighted_avg`` summed raw doubles (association-
order-dependent, 1 ULP off at sf0.1 only) and ``stream_interval_join``
NULLed a cross-batch integer payload. A gate that is green at one scale
has not been shown scale-independent; this test makes the sweep a
repeatable artifact instead of a per-round judge heroic.

Split marking (VERDICT r11 #1): the driver's per-round CORRECTNESS
check rotates a 50-gate slice of the ~280-name registry, so a
regression in a rotated-out gate could ride undetected for ~5 rounds
if full-registry certification only lives behind an explicit marker.
The CHEAP leg — all gates at sf0.001 — is therefore UNMARKED and runs
in every plain ``pytest tests/`` invocation (~6 min: one shared
SparkSession, one DuckDB connection, ~280 toPandas round-trips on
60k-row-class inputs). The expensive sf0.01/sf0.1 legs stay
``sweep``-marked and EXCLUDED from the default run (pytest.ini
``addopts = -m "not sweep"``). Run the full three-scale sweep:

    python -m pytest tests/test_three_scale_sweep.py -m "sweep or not sweep" -q

or per scale:

    python -m pytest "tests/test_three_scale_sweep.py::test_three_scale_sweep[sf0.1]" -m sweep -q
"""

from __future__ import annotations

from pathlib import Path

import pytest

from oracle_check import compare, duck_connection

# sf0.001 unmarked -> default suite; the two big scales stay opt-in
SCALES = [
    pytest.param("sf0.001", id="sf0.001"),
    pytest.param("sf0.01", id="sf0.01", marks=pytest.mark.sweep),
    pytest.param("sf0.1", id="sf0.1", marks=pytest.mark.sweep),
]


@pytest.mark.parametrize("sf_name", SCALES)
def test_three_scale_sweep(spark, sf_name):
    import __spark_entry__ as entrymod

    sf_dir = f"/root/testdata/{sf_name}"
    if not Path(sf_dir).is_dir():
        pytest.skip(f"{sf_dir} not present")
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures: list[str] = []
    n_checked = 0
    for name, fn in queries.items():
        if name not in oracles:
            continue  # rows-only entries have no cross-engine twin
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: spark raised {type(e).__name__}: {e}")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: oracle raised {type(e).__name__}: {e}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append(f"{name}: " + "; ".join(p.splitlines()[0] for p in problems))
        n_checked += 1

    assert not failures, (
        f"{len(failures)} gate(s) diverge at {sf_name} "
        f"({n_checked} checked):\n" + "\n".join(failures)
    )
    assert n_checked > 200  # the registry shrank? investigate, don't pass
