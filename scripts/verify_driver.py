#!/usr/bin/env python
"""Driver-contract emulator: does what the round driver does, end-to-end.

- imports ``__spark_entry__`` from the repo root (fresh process = real surface)
- smoke: ``entry(spark)`` at sf0.001 must return >0 rows with a stable schema
- correctness: every ``queries()`` entry runs at sf0.01; entries with an
  ``oracle_sql()`` are compared against DuckDB (row count + sorted-column
  names + order-insensitive value hash); the rest get a rows-only check.

Usage: python scripts/verify_driver.py [--sf-dir /root/testdata/sf0.01] [name ...]
Exit 0 iff everything matches. Prints one line per query.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, stringify rows, sort, hash."""
    import datetime

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            nonnull = s.dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
    rows = []
    for tup in df.itertuples(index=False, name=None):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(repr(round(v, 9) + 0.0))  # +0.0: -0.0 → 0.0
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # DRIVER PARITY: the round driver builds its own vanilla SparkSession —
    # deliberately NOT session.get_spark() — so any query that silently
    # depends on a get_spark()-only conf fails here the same way it fails
    # in the driver (this exact gap hid the r1 events/NANOS bug).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("verify_driver").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    # --- smoke ---
    t0 = time.time()
    edf = entrymod.entry(spark)
    rows = edf.count()
    print(f"[smoke] entry(spark) -> {rows} rows, "
          f"schema={[f.name for f in edf.schema.fields]} ({time.time()-t0:.1f}s)")
    ok = rows > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    stray = set(oracles) - set(queries)
    if stray:
        print(f"[contract] FAIL oracle keys without queries: {sorted(stray)}")
        ok = False

    names = args.names or sorted(queries)
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir).toPandas()
        except Exception as exc:  # driver records this as a failure
            print(f"[{name}] FAIL spark error: {exc}")
            ok = False
            continue
        finally:
            # several rows persist docs-sized relations under a
            # caller-release contract (ngram/minhash token projections, the
            # tfidf vector relation, prep's cleaned corpus) — holding all of
            # them across a 50-query session accumulates executor storage
            spark.catalog.clearCache()
        dt = time.time() - t0
        if name not in oracles:
            print(f"[{name}] rows-only: {len(sdf)} rows, "
                  f"cols={sorted(sdf.columns)} ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"[{name}] FAIL oracle error: {exc}")
            ok = False
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)}!={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)}!={sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs}!={ho}")
        if problems:
            print(f"[{name}] FAIL {'; '.join(problems)} ({dt:.1f}s)")
            ok = False
        else:
            print(f"[{name}] OK {len(sdf)} rows hash-match ({dt:.1f}s)")

    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
