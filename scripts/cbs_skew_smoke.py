#!/usr/bin/env python
"""Skew smoke for the two-phase cluster_balanced_sample quota selection
(r7 VERDICT item 1 done-criterion): k=4 clusters, quota 64 — the exact
configuration where the OLD single-window shape shuffled the whole corpus
into 4 reducer partitions and fully sorted each cluster, so wall time grew
superlinearly with rows (a handful of monster sort tasks). The two-phase
shape prunes map-side to <= quota*k candidates per partition, ranks only
candidates, and broadcast-joins the keeper set back — so wall should grow
~linearly with the scan (near-flat per-row cost) from N to 16N rows.

Usage: python scripts/cbs_skew_smoke.py [base_rows]   (default 60_000)
Prints one JSON line: {"base_rows": N, "t_base_s": ..., "t_16x_s": ...,
"per_row_ratio": t16/(16*t1)} — per_row_ratio ~1.0 means flat scaling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM, K, QUOTA, SEED = 16, 4, 64, 777


def synth(spark, n_rows: int, parts: int):
    """Seeded synthetic embeddings: deterministic per-id pseudo-Gaussian
    coordinates via the portable md5 convention (no rand() — rerunnable)."""
    base = spark.range(0, n_rows, 1, parts)
    coords = [
        (F.conv(F.substring(F.md5(F.concat_ws("|", F.col("id"), F.lit(i))),
                            1, 8), 16, 10).cast("long") % 2000 - 1000)
        .cast("double") / 1000.0
        for i in range(DIM)
    ]
    return base.select(F.col("id").alias("vec_id"),
                       F.array(*coords).alias("embedding"))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    from data_engineering_etl_pipeline_spark.caching import release_engine_pins
    from data_engineering_etl_pipeline_spark.extensions.similarity import (
        cluster_balanced_sample, planted_centroids)
    from data_engineering_etl_pipeline_spark.session import get_spark

    spark = get_spark("cbs-skew-smoke")
    cents = planted_centroids(SEED, K, DIM)

    def run(rows: int, parts: int) -> float:
        df = synth(spark, rows, parts)
        # warm (codegen/Python workers), then timed
        for timed in (False, True):
            t0 = time.time()
            (cluster_balanced_sample(df, quota_per_cluster=QUOTA,
                                     id_col="vec_id", seed=SEED, dim=DIM,
                                     centroids=cents, assign="gemm")
             .write.format("noop").mode("overwrite").save())
            dt = time.time() - t0
            release_engine_pins()
            spark.catalog.clearCache()
        return round(dt, 3)

    t1 = run(n, 8)
    t16 = run(16 * n, 32)
    out = {"base_rows": n, "t_base_s": t1, "t_16x_s": t16,
           "per_row_ratio": round(t16 / (16 * t1), 3),
           "note": "ratio ~<=1 means flat per-row cost at 16x rows, k=4"}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
