#!/usr/bin/env python
"""Scale smoke: inflate the star schema Nx (default 16x -> ~9.6M lineitem
rows across 32 files so scans parallelize past the driver testdata's
single-row-group layout), then run the relational headline queries on the
inflated copy and report per-query seconds + million-rows-per-second.

The point is the scaling SHAPE: the same plans, 16x the data, should cost
~16x the single-thread work but run on 32 cores — wall time should grow
sub-linearly vs sf0.1 (which is scan-parallelism-starved at 1 task).

Usage: python scripts/scale_smoke.py [multiplier]
Writes inflated parquet under /tmp/etl_spark_scale_smoke/ (reused if
present for the same multiplier).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERY_SET = [
    "pricing_summary",
    "region_revenue",
    "monthly_top_customers",
    "canonical_part_agg",
    "rolling_price_stats",
    "daily_share_and_rank",
    "hml_factor",
    "quality_gate_summary",
    "supplier_declarative_agg",
    "sql_nation_revenue",
    "user_sessions",
    "hourly_event_windows",
    "supplier_feature_matrix",
]

KEY_SHIFT = 1_000_000_000


def inflate(spark, mult: int, out_dir: str) -> None:
    """Replicate fact tables with shifted order/event keys (join integrity
    preserved; group-key cardinality for custkey/suppkey unchanged → per-key
    weight grows mult×, a mild skew stress). Dims copied as-is."""
    from data_engineering_etl_pipeline_spark.io import load_table

    os.makedirs(out_dir, exist_ok=True)
    rep = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(mult - 1).cast("long"))
    ).alias("__rep")

    def write(df, name):
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    orders = load_table(spark, SRC, "orders").select("*", rep)
    write(orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__rep") * KEY_SHIFT
    ).drop("__rep"), "orders")

    li = load_table(spark, SRC, "lineitem").select("*", rep)
    write(li.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__rep") * KEY_SHIFT
    ).drop("__rep"), "lineitem")

    ev = load_table(spark, SRC, "events").select("*", rep)
    write(ev.withColumn(
        "event_id", F.col("event_id") + F.col("__rep") * KEY_SHIFT
    ).drop("__rep"), "events")

    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"):
        write(load_table(spark, SRC, t), t)


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out_dir = f"/tmp/etl_spark_scale_smoke/x{mult}"
    from data_engineering_etl_pipeline_spark.queries import QUERIES
    from data_engineering_etl_pipeline_spark.session import get_spark

    spark = get_spark("scale-smoke")
    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        t0 = time.time()
        inflate(spark, mult, out_dir)
        print(f"# inflated x{mult} in {time.time()-t0:.1f}s", file=sys.stderr)

    n_li = spark.read.parquet(os.path.join(out_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    for name in QUERY_SET:           # pass 1: warm code
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for name in QUERY_SET:           # pass 2: steady state
        t0 = time.time()
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "scale_smoke_seconds",
        "multiplier": mult,
        "lineitem_rows": n_li,
        "value": total,
        "unit": "sec",
        "mrows_per_sec_lineitem": round(n_li * len(times) / total / 1e6, 2),
        "queries": times,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
