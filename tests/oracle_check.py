"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin in DuckDB
over the same parquet tables, compare row count + schema (names) +
order-insensitive values.

CLI:  python tests/oracle_check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon_cell(v):
    """Engine-independent string form of an object-column cell. Spark's
    toPandas renders array columns as numpy arrays, DuckDB's fetchdf as
    Python lists — ``astype(str)`` gave them different reprs ('[1. 2.]'
    vs '[1.0, 2.0]') and element-wise ``!=`` raised on the raw arrays
    (the r7 advice item). Recursive canonicalization compares them by
    VALUE; numeric scalars go through float/int so float32 vs float64
    boxing cannot differ."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(_canon_cell)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(
    name: str,
    spark_pdf: pd.DataFrame,
    duck_pdf: pd.DataFrame,
    loose: bool = False,
) -> list[str]:
    """Default is BIT-EXACT float comparison — the driver hashes values
    bit-exactly, and r6's red row (`compact_orders_roundtrip`) passed the old
    ``np.allclose`` check while failing the driver.  ``loose=True`` restores
    the tolerance comparison for debugging only."""
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            a, b = sc.astype("float64").to_numpy(), dc.astype("float64").to_numpy()
            if loose:
                bad = ~np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            else:
                bad = ~((a == b) | (np.isnan(a) & np.isnan(b)))
            ok = not bad.any()
        elif sc.dtype != dc.dtype:
            # the old Series.equals comparison failed on dtype drift
            # (int32 vs int64, bool vs bigint) — keep flagging it so the
            # local harness catches what the driver's schema check would
            problems.append(f"dtype drift in column {c}: spark={sc.dtype} duck={dc.dtype}")
            continue
        else:
            bad = (sc != dc).to_numpy() & ~(sc.isna() & dc.isna()).to_numpy()
            ok = not bad.any()
        if not ok:
            idx = np.nonzero(bad)[0][:5]
            sample = pd.DataFrame(
                {"spark": sc.iloc[idx].to_list(), "duck": dc.iloc[idx].to_list()}
            )
            problems.append(f"values differ in column {c}:\n{sample}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--loose",
        action="store_true",
        help="tolerance float compare (driver is bit-exact; debugging only)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cassandra_diff_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duck_connection(args.sf)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    n_fail = 0
    for name in names:
        try:
            spark_pdf = queries[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark query raised: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: no oracle, {len(spark_pdf)} rows (weak check)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf, loose=args.loose)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}:")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_pdf)} rows")
    print(f"\n{len(names) - n_fail}/{len(names)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
