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


#: worker threads for the sweep. The per-gate cost at sweep scale is
#: serial latency (driver-side planning, a 2-5 stage action on 60k-row
#: inputs, one toPandas, one single-threaded DuckDB twin), so the shared
#: local[8] session is mostly idle — overlapping independent gates from
#: a small thread pool (guide §2.6: actions are only sequential because
#: the driver calls them sequentially) cut the sf0.001 leg from 473 s to
#: ~⅓ while running the EXACT same ~280 checks. Gate thread-safety:
#: memory-sink queryNames are unique per gate, fixture staging is
#: pre-run (and flocked), tracked_cache appends are GIL-atomic, and the
#: one session-conf wrapper (_with_stream_conf) writes the value the
#: test session already runs at (shuffle_partitions=8).
SWEEP_THREADS = 8


@pytest.mark.parametrize("sf_name", SCALES)
def test_three_scale_sweep(spark, sf_name):
    import queue
    import threading

    import __spark_entry__ as entrymod
    from cassandra_diff_spark import gate_pipeline

    sf_dir = f"/root/testdata/{sf_name}"
    if not Path(sf_dir).is_dir():
        pytest.skip(f"{sf_dir} not present")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # stage every /tmp fixture up front (single-threaded) so concurrent
    # gates never race a build — the same call the bench warm-up makes
    gate_pipeline.stage_fixtures(spark, sf_dir)

    work: "queue.Queue[str]" = queue.Queue()
    names = [n for n in queries if n in oracles]
    for n in names:
        work.put(n)  # rows-only entries have no cross-engine twin

    failures: list[str] = []
    n_checked = 0
    lock = threading.Lock()

    def worker():
        nonlocal n_checked
        con = duck_connection(sf_dir)  # duckdb connections are per-thread
        while True:
            try:
                name = work.get_nowait()
            except queue.Empty:
                return
            try:
                spark_pdf = queries[name](spark, sf_dir).toPandas()
            except Exception as e:  # noqa: BLE001
                with lock:
                    failures.append(
                        f"{name}: spark raised {type(e).__name__}: {e}"
                    )
                continue
            try:
                duck_pdf = con.execute(oracles[name]).fetchdf()
            except Exception as e:  # noqa: BLE001
                with lock:
                    failures.append(
                        f"{name}: oracle raised {type(e).__name__}: {e}"
                    )
                continue
            problems = compare(name, spark_pdf, duck_pdf)
            with lock:
                if problems:
                    failures.append(
                        f"{name}: "
                        + "; ".join(p.splitlines()[0] for p in problems)
                    )
                n_checked += 1

    threads = [
        threading.Thread(target=worker, daemon=True)
        for _ in range(SWEEP_THREADS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    failures.sort()
    assert not failures, (
        f"{len(failures)} gate(s) diverge at {sf_name} "
        f"({n_checked} checked):\n" + "\n".join(failures)
    )
    assert n_checked > 200  # the registry shrank? investigate, don't pass
    assert n_checked == len(names)  # every oracle-paired gate was checked
