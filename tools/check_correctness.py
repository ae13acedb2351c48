"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check_correctness.py [--tol=REL] [sf_dir] [query ...]
Compares each suite query against its oracle: row count, sorted column
names, and order-insensitive value comparison (rows sorted by all columns).

``--tol=1e-12`` switches float comparison from exact repr equality to a
relative tolerance. Needed for scale runs (sf >= 1): decimal-staged sums
whose unscaled value exceeds 2^53 convert decimal->double with one rounding
in Spark (BigDecimal.doubleValue) but two in DuckDB (int64 -> double, then
/ 10^scale), so the engines can land on adjacent doubles — a representation
artifact, not a value divergence. The driver's gate runs at sf0.01 where
every such conversion is exact and comparison stays bit-for-bit.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_file_loader_spark import suite  # noqa: E402
from etl_file_loader_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols, tol: float | None = None):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                # under --tol, quantize floats so values within the relative
                # tolerance normalize identically (adjacent-double artifacts
                # of big-decimal -> double conversion, see module docstring)
                if tol and v != 0.0:
                    from math import floor, log10

                    digits = max(0, 14 - int(floor(log10(abs(v)))) - 1)
                    v = repr(round(v, digits))
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    args = sys.argv[1:]
    tol = None
    args = [a for a in args if not (a.startswith("--tol") and (tol := float(a.split("=", 1)[1])))]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file parquet; tools/gen_scale_data.py
        # writes Spark directory-parquet — glob the parts in that case
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if Path(p).is_dir() else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    passed, failed = [], []
    for name, fn in suite.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"))
            continue
        oracle = suite.ORACLES.get(name)
        if oracle is None:
            status = f"rows-only: {len(srows)} rows"
            passed.append((name, status, time.time() - t0))
            continue
        try:
            res = con.execute(oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failed.append((name, f"ORACLE ERROR: {str(e)[:300]}"))
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sn, on = normalize(srows, scols, tol), normalize(orows, ocols, tol)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failed.append((name, "; ".join(problems)[:500]))
        else:
            passed.append((name, f"{len(srows)} rows", time.time() - t0))

    for name, status, dt in passed:
        print(f"PASS  {name:28s} {status} ({dt:.1f}s)")
    for name, msg in failed:
        print(f"FAIL  {name:28s} {msg}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
