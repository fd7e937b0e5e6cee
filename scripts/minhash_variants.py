#!/usr/bin/env python
"""One-off perf harness for doc_minhash_lsh plan variants (r4 VERDICT item
2, ADVICE item 1). Times each variant min-of-3 at sf0.1 and verifies pair
sets match. Not part of CI — a measurement tool."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.extensions.dedup import (
    _verify_pairs, minhash_signatures, shingles_from_tokens, tokenized_docs)
from data_engineering_etl_pipeline_spark.io import load_table
from data_engineering_etl_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N, NUM_PERM, BANDS, THRESH = 3, 64, 32, 0.8


def band_cols(num_perm, bands):
    rows = num_perm // bands
    return [
        F.xxhash64(F.concat_ws("_", F.lit(bi),
                               *[F.col(f"mh_{bi * rows + r}") for r in range(rows)]))
        .alias(f"band_{bi}")
        for bi in range(bands)
    ]


def bucketize(banded, id_col, bands):
    return banded.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"), F.col(f"band_{bi}").alias("bh"))
            for bi in range(bands)
        ])).alias("b"),
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))


def pairs_from_bucket(bucket, id_col, repartition_first):
    if repartition_first:
        n_parts = int(bucket.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        bucket = bucket.repartition(n_parts, "band", "bh")
    left = bucket.select(F.col(id_col).alias("id_a"), "band", "bh")
    right = bucket.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (left.join(right, ["band", "bh"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct())


def v_current(docs, id_col="doc_id", text_col="text"):
    """r4 shape: persist 64-col sig, project bands, repartition bucket."""
    tok = tokenized_docs(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh = shingles_from_tokens(tok, id_col, N)
    sig = (minhash_signatures(sh, id_col, NUM_PERM)
           .persist(StorageLevel.MEMORY_AND_DISK))
    banded = sig.select(F.col(id_col), *band_cols(NUM_PERM, BANDS))
    cand = pairs_from_bucket(bucketize(banded, id_col, BANDS), id_col, True)
    return _verify_pairs(tok, id_col, N, cand, THRESH)


def v_banded_persist(docs, id_col="doc_id", text_col="text"):
    """Fold band hashes into the signature select; persist the 32-col
    banded relation instead of the 64-col sig."""
    tok = tokenized_docs(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh = shingles_from_tokens(tok, id_col, N)
    banded = (minhash_signatures(sh, id_col, NUM_PERM)
              .select(F.col(id_col), *band_cols(NUM_PERM, BANDS))
              .persist(StorageLevel.MEMORY_AND_DISK))
    cand = pairs_from_bucket(bucketize(banded, id_col, BANDS), id_col, True)
    return _verify_pairs(tok, id_col, N, cand, THRESH)


def v_no_persist_repart(docs, id_col="doc_id", text_col="text"):
    """No signature persist at all; rely on the bucket repartition exchange
    being reused for both self-join sides."""
    tok = tokenized_docs(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh = shingles_from_tokens(tok, id_col, N)
    banded = (minhash_signatures(sh, id_col, NUM_PERM)
              .select(F.col(id_col), *band_cols(NUM_PERM, BANDS)))
    cand = pairs_from_bucket(bucketize(banded, id_col, BANDS), id_col, True)
    return _verify_pairs(tok, id_col, N, cand, THRESH)


def v_no_persist_no_repart(docs, id_col="doc_id", text_col="text"):
    """No persist, no explicit repartition: AQE plans the self-join."""
    tok = tokenized_docs(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh = shingles_from_tokens(tok, id_col, N)
    banded = (minhash_signatures(sh, id_col, NUM_PERM)
              .select(F.col(id_col), *band_cols(NUM_PERM, BANDS)))
    cand = pairs_from_bucket(bucketize(banded, id_col, BANDS), id_col, False)
    return _verify_pairs(tok, id_col, N, cand, THRESH)


def v_banded_persist_no_repart(docs, id_col="doc_id", text_col="text"):
    """Banded persist + AQE-planned self-join (no explicit repartition)."""
    tok = tokenized_docs(docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh = shingles_from_tokens(tok, id_col, N)
    banded = (minhash_signatures(sh, id_col, NUM_PERM)
              .select(F.col(id_col), *band_cols(NUM_PERM, BANDS))
              .persist(StorageLevel.MEMORY_AND_DISK))
    cand = pairs_from_bucket(bucketize(banded, id_col, BANDS), id_col, False)
    return _verify_pairs(tok, id_col, N, cand, THRESH)


VARIANTS = {
    "current": v_current,
    "banded_persist": v_banded_persist,
    "no_persist_repart": v_no_persist_repart,
    "no_persist_no_repart": v_no_persist_no_repart,
    "banded_persist_no_repart": v_banded_persist_no_repart,
}


def main():
    spark = get_spark("minhash-variants")
    docs = load_table(spark, SF_DIR, "documents")
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    counts = {}
    for name in names:
        fn = VARIANTS[name]
        # warm
        fn(docs).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        counts[name] = fn(docs).count()
        spark.catalog.clearCache()
        results[name] = round(best, 3)
        print(f"{name}: {results[name]}s  rows={counts[name]}", flush=True)
    assert len(set(counts.values())) == 1, f"variant row counts differ: {counts}"
    print("ALL VARIANTS AGREE:", results)


if __name__ == "__main__":
    main()
