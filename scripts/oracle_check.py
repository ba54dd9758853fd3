"""Self-check harness mimicking the driver's correctness gate:
runs every `queries()` entry via Spark and its `oracle_sql()` twin via
DuckDB on the same sf dir, then compares row count, column names, and
an order-insensitive value multiset (floats canonicalized to 9
significant digits).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from document_extractor_spark.session import build_session  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if isinstance(v, (list, tuple, dict, set, bytearray)) or (
            type(v).__name__ == "ndarray"):
        # The DRIVER's canonicalizer (pandas sort_values / hashing)
        # crashes on list-typed cells (CORRECTNESS_r04
        # hashed_embeddings: "unhashable type: 'list'").  The old
        # str(v) fallback here silently accepted them — an
        # emulator-fidelity bug.  Fail loudly so emulator-green
        # implies driver-green: queries must serialize collection
        # columns (CSV / to_json) before the gate.
        raise TypeError(
            f"collection-typed result cell ({type(v).__name__}): the "
            f"driver gate cannot canonicalize it — serialize the "
            f"column (concat_ws/to_json) in the query")
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _reorder(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="oracle-check", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not produce a vacuous ALL OK
        print(f"FAIL  unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s, rows-only)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
        elif len(srows) != len(orows):
            ok = False
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
        else:
            try:
                a = _normalize(srows, scols)
                b = _normalize(orows, ocols)
            except TypeError as exc:
                failures.append(name)
                print(f"FAIL  {name}: canonicalization error (driver "
                      f"gate would crash): {exc}")
                continue
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            else:
                # exact-value + type pass, mimicking the driver's
                # dtype-sensitive hash (DuckDB HUGEINT vs Spark long
                # was the round-1 failure class)
                ax = sorted(
                    tuple((type(v).__name__, repr(v)) for v in r)
                    for r in (_reorder(srows, scols)))
                bx = sorted(
                    tuple((type(v).__name__, repr(v)) for v in r)
                    for r in (_reorder(orows, ocols)))
                if ax != bx:
                    ok = False
                    diff = [(x, y) for x, y in zip(ax, bx) if x != y][:2]
                    print(f"FAIL  {name}: exact type/value mismatch "
                          f"(driver hash would differ): {diff}")
        if ok:
            print(f"OK    {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
