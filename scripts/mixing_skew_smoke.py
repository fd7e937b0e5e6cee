#!/usr/bin/env python
"""Skew smoke for the mixing/schedule family: 3 sources with a 90%-hot
head key — the configuration where a naive Window.partitionBy(source)
shape would sort ~all rows in ONE reducer task.

Three machines measured at N and 16N rows (r11 VERDICT item 7 extended
the original batch-fill smoke to the whole family):

- ``fill``: sample_to_token_budget — the two-phase shape prunes
  map-side to each partition's within-budget prefix (+1 crossing row),
  sorts candidates only, and broadcast-joins the keepers back;
- ``incr_fill``: incremental_token_budget_fill day-2 batch against a
  day-1 consumed state — same two-phase core plus the keeper-sized
  spent agg and the state merge, under the same hot key;
- ``epoch_plan``: the (epoch, shard)-partitioned reshuffle rank with
  90% of packs in ONE shard — the dominant-shard adversary for its
  per-shard sort (shards are hash-uniform when pack_sequences assigns
  them; this measures the cost when a CALLER feeds skewed shards).

Usage: python scripts/mixing_skew_smoke.py [base_rows]  (default 200_000)
Prints one JSON line mapping each machine to {"t_base_s", "t_16x_s",
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
    from data_engineering_etl_pipeline_spark.extensions.corpus import (
        epoch_plan)
    from data_engineering_etl_pipeline_spark.extensions.mixing import (
        incremental_token_budget_fill, sample_to_token_budget)
    from data_engineering_etl_pipeline_spark.session import get_spark

    spark = get_spark("mixing-skew-smoke")

    def timed_run(build) -> float:
        """Warm once (codegen/Python workers), then time; engine pins and
        caches released between passes so nothing reuses intermediates."""
        for timed in (False, True):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_engine_pins()
            spark.catalog.clearCache()
        return round(dt, 3)

    def fill(rows: int, parts: int) -> float:
        df = synth(spark, rows, parts)
        return timed_run(lambda: sample_to_token_budget(
            df, BUDGETS, key_col="lang", token_col="n_tokens",
            id_col="doc_id", salt="skew-smoke"))

    # day-1 state: a fixed small batch consumes part of every budget, so
    # the timed day-2 batch exercises the remaining-budget arithmetic +
    # keeper-sized spent agg + state merge, not a fresh-state degenerate
    _, day1_state = incremental_token_budget_fill(
        synth(spark, 50_000, 8).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000),
        None, BUDGETS, key_col="lang", token_col="n_tokens",
        id_col="doc_id", salt="skew-smoke")
    day1_state = day1_state.collect()  # freeze: KB-scale metadata

    def incr_fill(rows: int, parts: int) -> float:
        state = spark.createDataFrame(day1_state)
        df = synth(spark, rows, parts)

        def build():
            flags, _ = incremental_token_budget_fill(
                df, state, BUDGETS, key_col="lang", token_col="n_tokens",
                id_col="doc_id", salt="skew-smoke")
            return flags

        return timed_run(build)

    def plan(rows: int, parts: int) -> float:
        base = spark.range(0, rows, 1, parts)
        hv = (F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("id"), F.lit("shard"))), 1, 8), 16, 10)
            .cast("long") % 100)
        shard = (F.when(hv < 90, F.lit(0))
                 .otherwise((hv % 8).cast("int"))).alias("shard")
        packs = base.select(F.col("id").alias("pack_id"), shard)
        return timed_run(lambda: epoch_plan(packs, n_epochs=4))

    out = {"base_rows": n}
    for name, fn in (("fill", fill), ("incr_fill", incr_fill),
                     ("epoch_plan", plan)):
        t1 = fn(n, 8)
        t16 = fn(16 * n, 32)
        out[name] = {"t_base_s": t1, "t_16x_s": t16,
                     "per_row_ratio": round(t16 / (16 * t1), 3)}
    out["note"] = ("ratio ~<=1 means flat per-row cost at 16x rows; "
                   "90%-hot head source (fill, incr_fill) / 90%-hot "
                   "shard (epoch_plan)")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
