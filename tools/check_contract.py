"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its
``oracle_sql()`` twin on DuckDB over the same parquet, then compares
row count, column names, and order-insensitive values (exact for
ints/strings/bools; floats compared exactly AND with a 1e-9 tolerance
fallback so rounding-boundary risks get flagged as RISKY instead of
silently passing).

Usage:
  python tools/check_contract.py [--sf DIR] [--names a,b,c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[str, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return "FAIL", f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return "FAIL", f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = canon(spark_pdf.copy()), canon(duck_pdf.copy())
    exact_ok = True
    risky = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            same = (avf == bvf) | (np.isnan(avf) & np.isnan(bvf))
            if not same.all():
                close = np.isclose(avf, bvf, rtol=0, atol=1e-9, equal_nan=True)
                if close.all():
                    risky.append(c)
                    exact_ok = False
                else:
                    bad = int((~close).sum())
                    i = int(np.flatnonzero(~close)[0])
                    return "FAIL", f"col {c}: {bad} values differ, e.g. {avf[i]} vs {bvf[i]}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                diff = (av.astype(str) != bv.astype(str))
                i = int(np.flatnonzero(diff.to_numpy())[0])
                return "FAIL", f"col {c}: values differ, e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    if not exact_ok:
        return "RISKY", f"float cols {risky} match only within 1e-9 (value-hash would FAIL)"
    return "OK", f"{len(a)} rows"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sketch_spark.session import get_spark

    spark = get_spark("contract-check", cores=8)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names.split(",") if args.names else list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[ROWS] {name}: {len(spark_pdf)} rows (no oracle; rows-only) [{dt:.1f}s]")
            if len(spark_pdf) == 0 and name not in ("embedding_near_dups",):
                print(f"       note: zero rows — check thresholds")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        status, msg = compare(name, spark_pdf, duck_pdf)
        mark = {"OK": "ok", "RISKY": "RISKY", "FAIL": "FAIL"}[status]
        print(f"[{mark.upper():5}] {name}: {msg} [{dt:.1f}s]")
        if status == "FAIL":
            failures += 1
    spark.stop()
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
