#!/usr/bin/env python
"""Scale smoke for the incremental SEMANTIC dedup index — the embedding
twin of incr_minhash_smoke.py (same operational claim, r11): a daily
ingest batch costs O(batch); the historical corpus participates ONLY
through its bucketed signature index, never re-hashed or rescanned. So:
fix the batch, grow the INDEX 1x -> 8x, and the per-batch wall should
stay ~flat (the index side of the (table, bucket) join is a
bucket-aligned scan of signature rows). A naive rerun-over-everything
design would grow ~linearly with history instead.

Usage: python scripts/incr_semantic_smoke.py [base_index_vecs]
(default 50_000). Prints one JSON line:
{"index_vecs": N, "batch_vecs": B, "t_small_s": ..., "t_big_s": ...,
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

BATCH_VECS = 8_000
GROWTH = 8
DIM = 64


def synth_vecs(spark, n: int, id_offset: int, seed_tag: str):
    """Deterministic pseudo-embeddings: component j of row i is a hashed
    uniform in [-1, 1). Every 11th row is an exact copy of its
    predecessor so the dedup path has real work at every size."""
    base = spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        (F.col("id") - F.pmod(F.col("id"), F.lit(11))).alias("__g"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.pmod(F.xxhash64(F.concat_ws(
            "_", F.lit(seed_tag), F.col("__g").cast("string"),
            j.cast("string"))), F.lit(2001)) - 1000).cast("double") / 1000.0)
    return base.select("vec_id", vec.alias("embedding"))


def timed_ingest(spark, index_table: str, batch) -> float:
    from data_engineering_etl_pipeline_spark.caching import engine_pin_scope
    from data_engineering_etl_pipeline_spark.extensions.similarity import (
        incremental_semantic_dedup, read_signature_index)

    index = read_signature_index(spark, index_table)
    t0 = time.time()
    with engine_pin_scope():
        fresh, updated = incremental_semantic_dedup(batch, index, dim=DIM)
        fresh.count()
        updated.count()
    return time.time() - t0


def main() -> None:
    from data_engineering_etl_pipeline_spark.extensions.similarity import (
        embedding_signature_index, write_signature_index)
    from data_engineering_etl_pipeline_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark("incr-semantic-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    small = synth_vecs(spark, n, 0, "hist")
    big = synth_vecs(spark, n * GROWTH, 0, "hist")
    write_signature_index(embedding_signature_index(small, dim=DIM),
                          "smoke_sig_small")
    write_signature_index(embedding_signature_index(big, dim=DIM),
                          "smoke_sig_big")

    # half the batch replays history vectors (cross-batch drops fire),
    # half is fresh — both decision paths exercised at every index size
    replay = synth_vecs(spark, BATCH_VECS // 2, 0, "hist") \
        .withColumn("vec_id", F.col("vec_id") + 50_000_000)
    fresh_rows = synth_vecs(spark, BATCH_VECS // 2, 60_000_000, "day2")
    batch = replay.unionByName(fresh_rows).cache()
    batch.count()

    # warm the code path once (JVM/Python-worker cold start is not the
    # claim under test), then measure each index size
    timed_ingest(spark, "smoke_sig_small", batch)
    t_small = min(timed_ingest(spark, "smoke_sig_small", batch)
                  for _ in range(2))
    t_big = min(timed_ingest(spark, "smoke_sig_big", batch)
                for _ in range(2))
    print(json.dumps({
        "index_vecs": n, "batch_vecs": BATCH_VECS,
        "t_small_s": round(t_small, 2), "t_big_s": round(t_big, 2),
        "index_growth": GROWTH,
        "batch_time_ratio": round(t_big / t_small, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
