#!/usr/bin/env python
"""Second bench scale point (r6 VERDICT item 5): inflate sf0.1 by an
integer multiplier into a bench-shaped synthetic "sf0.3" (default 3x) and
run the FULL bench protocol (bench.py, unchanged: warmup + min-of-3,
cold-data between queries) against it — so per-query scaling of every
REGISTERED row is on the record, catching any cost that is
superlinear-in-SF which the per-family smokes don't cover.

Usage: python scripts/bench_scale_point.py [multiplier]
Writes inflated parquet under /tmp/etl_spark_bench_sf0.3/ (reused when
present for the same multiplier) and prints bench.py's one-line JSON.

Replica construction keeps per-row workload density SF-like instead of
multiplying duplicate structure (the scale_smoke fact recipe, extended to
the corpus tables):

- facts (orders/lineitem/events): replicated with per-replica key shifts —
  join integrity preserved; per-group density grows mult×, key cardinality
  fixed (a mild skew stress, like scale_smoke).
- documents: replica-tagged FIRST TOKEN ("r<rep> " prefix; NULL text stays
  NULL) — texts stay distinct across replicas, so exact-dup groups and
  near-dup pair counts grow LINEARLY with rows (a verbatim text copy per
  replica would instead make every doc a cross-replica near-dup — a
  different, quadratic-pair workload, not SF growth).
- embeddings: replica-distinct half-negations (replica 1 negates dims
  [0,32), replica 2 negates [32,64)) — norm-preserving and deterministic;
  cosine between a row's replicas is ≤ 0, so no new near-dup pairs and the
  planted vec_id%7 recipe inside the queries scales linearly.
- dims (region/nation/customer/supplier/part): copied as-is.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_SHIFT = 1_000_000_000


def inflate(mult: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from data_engineering_etl_pipeline_spark.io import load_table
    from data_engineering_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench-scale-point-inflate")
    os.makedirs(out_dir, exist_ok=True)
    rep = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(mult - 1).cast("long"))
    ).alias("__rep")

    def write(df, name):
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
                      ("events", "event_id")):
        t = load_table(spark, SRC, name).select("*", rep)
        write(t.withColumn(key, F.col(key) + F.col("__rep") * KEY_SHIFT)
              .drop("__rep"), name)

    docs = load_table(spark, SRC, "documents").select("*", rep)
    docs = (docs.withColumn("doc_id",
                            F.col("doc_id") + F.col("__rep") * KEY_SHIFT)
            .withColumn("text", F.concat(F.lit("r"),
                                         F.col("__rep").cast("string"),
                                         F.lit(" "), F.col("text")))
            .drop("__rep"))
    write(docs, "documents")

    emb = load_table(spark, SRC, "embeddings").select("*", rep)
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            ((F.col("__rep") == 1) & (i < 32))
            | ((F.col("__rep") == 2) & (i >= 32)), -x).otherwise(x))
    emb = (emb.withColumn("vec_id",
                          F.col("vec_id") + F.col("__rep") * KEY_SHIFT)
           .withColumn("embedding", flipped)
           .drop("__rep"))
    write(emb, "embeddings")

    for t in ("region", "nation", "customer", "supplier", "part"):
        write(load_table(spark, SRC, t), t)
    spark.stop()


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = 0.1 * mult
    out_dir = f"/tmp/etl_spark_bench_sf{sf:g}"
    marker = os.path.join(out_dir, f".mult_{mult}")
    if not os.path.exists(marker):
        inflate(mult, out_dir)
        open(marker, "w").close()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call([sys.executable,
                            os.path.join(repo, "bench.py")], env=env)


if __name__ == "__main__":
    sys.exit(main())
