"""The standing three-scale oracle sweep (VERDICT r8 #7): every
oracle-paired gate, bit-exact, at sf0.001 AND sf0.01 AND sf0.1.

Why it exists: r8's ad-hoc sweep caught two REAL bugs invisible at the
driver's scale — ``time_weighted_avg`` summed raw doubles (association-
order-dependent, 1 ULP off at sf0.1 only) and ``stream_interval_join``
NULLed a cross-batch integer payload. A gate that is green at one scale
has not been shown scale-independent; this test makes the sweep a
repeatable artifact instead of a per-round judge heroic.

It is ``sweep``-marked and EXCLUDED from the default run (pytest.ini
``addopts = -m "not sweep"``) because 3 x ~260 gates is an hour-plus of
wall clock — the default suite must stay CI-sized. Run it explicitly:

    python -m pytest tests/test_three_scale_sweep.py -m sweep -q

or per scale:

    python -m pytest "tests/test_three_scale_sweep.py::test_three_scale_sweep[sf0.1]" -m sweep -q
"""

from __future__ import annotations

from pathlib import Path

import pytest

from oracle_check import compare, duck_connection

SCALES = ["sf0.001", "sf0.01", "sf0.1"]


@pytest.mark.sweep
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
