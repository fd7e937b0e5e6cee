#!/usr/bin/env python
"""Skew smoke for the two-phase token-budget fill
(extensions/mixing.sample_to_token_budget): 3 sources with a 90%-hot
head key — the configuration where a naive Window.partitionBy(source)
shape would sort ~all rows in ONE reducer task. The two-phase shape
prunes map-side to each partition's within-budget prefix (+1 crossing
row), sorts candidates only, and broadcast-joins the keepers back — so
wall should grow ~linearly with the scan from N to 16N rows.

Usage: python scripts/mixing_skew_smoke.py [base_rows]  (default 200_000)
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

#: per-source token budgets — small against the corpus mass, so the
#: prune drops almost everything map-side (the 100 TB shape: budgets
#: are set by the training run, not the crawl size)
BUDGETS = {"head": 200_000, "mid": 50_000, "tail": 10_000}


def synth(spark, n_rows: int, parts: int):
    """Seeded synthetic (id, source, tokens): 90% of rows in the 'head'
    source (hot key), token counts 1..400 — deterministic md5 coords
    (no rand(), rerunnable)."""
    base = spark.range(0, n_rows, 1, parts)
    hv = (F.conv(F.substring(F.md5(F.concat_ws("|", F.col("id"),
                                               F.lit("src"))), 1, 8),
                 16, 10).cast("long") % 100)
    src = (F.when(hv < 90, F.lit("head")).when(hv < 97, F.lit("mid"))
           .otherwise(F.lit("tail")))
    tok = (F.conv(F.substring(F.md5(F.concat_ws("|", F.col("id"),
                                                F.lit("tok"))), 1, 8),
                  16, 10).cast("long") % 400 + 1)
    return base.select(F.col("id").alias("doc_id"), src.alias("lang"),
                       tok.alias("n_tokens"))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from data_engineering_etl_pipeline_spark.caching import (
        release_engine_pins)
    from data_engineering_etl_pipeline_spark.extensions.mixing import (
        sample_to_token_budget)
    from data_engineering_etl_pipeline_spark.session import get_spark

    spark = get_spark("mixing-skew-smoke")

    def run(rows: int, parts: int) -> float:
        df = synth(spark, rows, parts)
        for timed in (False, True):
            t0 = time.time()
            (sample_to_token_budget(df, BUDGETS, key_col="lang",
                                    token_col="n_tokens", id_col="doc_id",
                                    salt="skew-smoke")
             .write.format("noop").mode("overwrite").save())
            dt = time.time() - t0
            release_engine_pins()
            spark.catalog.clearCache()
        return round(dt, 3)

    t1 = run(n, 8)
    t16 = run(16 * n, 32)
    out = {"base_rows": n, "t_base_s": t1, "t_16x_s": t16,
           "per_row_ratio": round(t16 / (16 * t1), 3),
           "note": "ratio ~<=1 means flat per-row cost at 16x rows, "
                   "90%-hot head source"}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
