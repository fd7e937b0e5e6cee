#!/usr/bin/env python
"""Scale smoke for the incremental MinHash-LSH index (r8 VERDICT item 3
done-criterion, scale leg): the operational claim is that a daily ingest
batch costs O(batch) — the historical corpus participates ONLY through
its bucketed band index, never re-banded or rescanned. So: fix the batch,
grow the INDEX 1x -> 8x, and the per-batch wall should stay ~flat (the
index side of the join is a bucket-aligned scan of band rows, not a
re-banding of history). A naive rerun-over-everything design would grow
~linearly with history instead.

Usage: python scripts/incr_minhash_smoke.py [base_index_docs]
(default 20_000). Prints one JSON line:
{"index_docs": N, "batch_docs": B, "t_small_s": ..., "t_big_s": ...,
 "index_growth": 8, "batch_time_ratio": t_big/t_small}
batch_time_ratio ~1.0 = flat per-batch cost under 8x history.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BATCH_DOCS = 4_000
GROWTH = 8


def synth_docs(spark, n: int, id_offset: int, seed_tag: str):
    """Deterministic pseudo-text: ~60 tokens per doc drawn from a hashed
    vocabulary, with every 11th doc an exact copy of its predecessor so
    the dedup path has real work at every size."""
    base = spark.range(n).select(
        (F.col("id") + id_offset).alias("doc_id"),
        F.col("id").alias("__i"))
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.concat_ws(
                "_", F.lit(seed_tag),
                (F.col("__i") - F.pmod(F.col("__i"), F.lit(11))).cast("string"),
                j.cast("string"))), F.lit(5000)).cast("string")))
    return base.select("doc_id", F.array_join(tok, " ").alias("text"))


def timed_ingest(spark, index_table: str, batch) -> float:
    from data_engineering_etl_pipeline_spark.caching import engine_pin_scope
    from data_engineering_etl_pipeline_spark.extensions.dedup import (
        incremental_minhash_lsh_dedup, read_minhash_band_index)

    index = read_minhash_band_index(spark, index_table)
    t0 = time.time()
    with engine_pin_scope():
        fresh, updated = incremental_minhash_lsh_dedup(batch, index)
        fresh.count()
        updated.count()
    return time.time() - t0


def main() -> None:
    from data_engineering_etl_pipeline_spark.extensions.dedup import (
        minhash_band_index, write_minhash_band_index)
    from data_engineering_etl_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("incr-minhash-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    small = synth_docs(spark, n, 0, "hist")
    big = synth_docs(spark, n * GROWTH, 0, "hist")
    write_minhash_band_index(minhash_band_index(small), "smoke_mh_small")
    write_minhash_band_index(minhash_band_index(big), "smoke_mh_big")

    batch = synth_docs(spark, BATCH_DOCS, 50_000_000, "day2").cache()
    batch.count()

    # warm the code path once (JVM/Python-worker cold start is not the
    # claim under test), then measure each index size
    timed_ingest(spark, "smoke_mh_small", batch)
    t_small = min(timed_ingest(spark, "smoke_mh_small", batch)
                  for _ in range(2))
    t_big = min(timed_ingest(spark, "smoke_mh_big", batch)
                for _ in range(2))
    print(json.dumps({
        "index_docs": n, "batch_docs": BATCH_DOCS,
        "t_small_s": round(t_small, 2), "t_big_s": round(t_big, 2),
        "index_growth": GROWTH,
        "batch_time_ratio": round(t_big / t_small, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
