"""Simulate the driver's correctness gate locally (the /verify drive).

Runs the FIRST 50 entries of ``__spark_entry__.queries()`` (the exact
window the driver samples) against their DuckDB oracles at sf0.01,
normalizing the same way the driver does: columns sorted by name,
floats rounded, rows sorted, values compared.

Usage:
    python scripts/verify_window.py               # full 50-query window
    python scripts/verify_window.py q1 q2 ...     # just the named queries
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(pdf):
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    pdf = pdf.astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as e
    from big_data_chicago_crimes_spark.session import get_spark

    sf = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="verify-window", shuffle_partitions=8)

    qs, oracles = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)[:50]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            spdf = norm(qs[name](spark, sf).toPandas())
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"[{i + 1}/{len(names)}] {name}: SPARK ERROR {exc}")
            continue
        if name not in oracles:
            print(
                f"[{i + 1}/{len(names)}] {name}: rows-only "
                f"({len(spdf)} rows, {time.time() - t0:.1f}s)"
            )
            continue
        try:
            opdf = norm(con.execute(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"oracle error: {exc}"))
            print(f"[{i + 1}/{len(names)}] {name}: ORACLE ERROR {exc}")
            continue
        if spdf.shape != opdf.shape:
            failures.append((name, f"shape {spdf.shape} vs {opdf.shape}"))
            print(
                f"[{i + 1}/{len(names)}] {name}: SHAPE MISMATCH "
                f"{spdf.shape} vs {opdf.shape}"
            )
            continue
        if list(spdf.columns) != list(opdf.columns):
            failures.append(
                (name, f"cols {list(spdf.columns)} vs {list(opdf.columns)}")
            )
            print(f"[{i + 1}/{len(names)}] {name}: COLUMN MISMATCH")
            continue
        if not (spdf.values == opdf.values).all():
            diff = (spdf.values != opdf.values).any(axis=1).sum()
            failures.append((name, f"{diff} mismatched rows"))
            print(f"[{i + 1}/{len(names)}] {name}: VALUE MISMATCH ({diff} rows)")
            continue
        print(
            f"[{i + 1}/{len(names)}] {name}: PASS "
            f"({len(spdf)} rows, {time.time() - t0:.1f}s)"
        )

    print()
    if failures:
        print(f"FAILED ({len(failures)}):")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print(f"ALL PASS ({len(names)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
