"""Quality-gate & audit queries (SURVEY.md §3 E3, §5) on the star schema:
the reference's circuit-breaker gate and pytest data-integrity invariants as
distributed queries (empty / summary results = healthy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..audits import backfill_bias, repaint_check
from ..io import load_table
from ..quality_gate import gate_report
from . import register


@register(
    "quality_gate_summary",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08
                      OR l_quantity <= 0 OR l_extendedprice <= 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS violation_rows,
           ROUND(100.0 * SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08
                                    OR l_quantity <= 0 OR l_extendedprice <= 0
                                  THEN 1 ELSE 0 END) / COUNT(*), 6) AS loss_pct,
           (100.0 * SUM(CASE WHEN l_discount < 0 OR l_discount > 0.08
                               OR l_quantity <= 0 OR l_extendedprice <= 0
                             THEN 1 ELSE 0 END) / COUNT(*)) > 5.0 AS breaker_tripped
    FROM lineitem
    """,
)
def quality_gate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 gate decision as one aggregate pass (reference
    data_quality_gate.py:46-61,101-110): row-validity predicate → violation
    count, loss %, and whether the 5% circuit breaker would trip."""
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        (F.col("l_discount") < 0) | (F.col("l_discount") > 0.08)
        | (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") <= 0)
    )
    return gate_report(li, bad, max_loss_pct=5.0)


@register(
    "backfill_bias_audit",
    oracle="""
    WITH old_v AS (
      SELECT o_custkey, MIN(o_orderdate) AS old_min_date
      FROM orders WHERE o_orderkey % 97 <> 0 GROUP BY 1
    ), new_v AS (
      SELECT o_custkey, MIN(o_orderdate) AS new_min_date
      FROM orders GROUP BY 1
    )
    SELECT o.o_custkey, o.old_min_date, n.new_min_date
    FROM old_v o JOIN new_v n USING (o_custkey)
    WHERE n.new_min_date < o.old_min_date
    """,
)
def backfill_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 backfill-bias audit (reference test_data_integrity.py:54-68): an
    entity's earliest date must not move earlier between snapshot versions.
    'Old' snapshot simulated deterministically by dropping every 97th order."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 97 != 0)
    return backfill_bias(old, orders, "o_custkey", "o_orderdate")


@register(
    "repaint_audit",
    oracle="""
    WITH old_v AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice * 1.001
                  ELSE o_totalprice END AS old_o_totalprice
      FROM orders
    )
    SELECT n.o_orderkey,
           ROUND(o.old_o_totalprice, 6) AS old_price,
           ROUND(n.o_totalprice, 6) AS new_price
    FROM old_v o JOIN orders n USING (o_orderkey)
    WHERE ABS(o.old_o_totalprice - n.o_totalprice) > 1e-9
    """,
)
def repaint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 historical-immutability audit (reference
    test_data_integrity.py:125-161): aligned cells must not change between
    versions. 'Old' version has every 101st price deterministically
    perturbed so the audit has positives."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") * 1.001)
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    out = repaint_check(old, orders, ["o_orderkey"], ["o_totalprice"], tol=1e-9)
    # round-6 is lossless for price*1.001 (≤5 decimals); round-4 would sit
    # exactly on half-boundaries where engine rounding of doubles diverges.
    return out.select(
        "o_orderkey",
        F.round("old_o_totalprice", 6).alias("old_price"),
        F.round("new_o_totalprice", 6).alias("new_price"),
    )


@register(
    "orderkey_dedup",
    oracle="""
    WITH doubled AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT COUNT(*) AS rows_before,
           (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey, o_custkey, o_totalprice
                                  FROM doubled)) AS rows_after
    FROM doubled
    """,
)
def orderkey_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 row-level dedup (reference set-based dedup,
    historical_data_etl.py:132): duplicate rows injected deterministically,
    removed by dropDuplicates (hash-groupBy under the hood)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    doubled = o.unionByName(o.filter(F.col("o_orderkey") % 10 == 0))
    before = doubled.agg(F.count(F.lit(1)).alias("rows_before"))
    after = doubled.dropDuplicates().agg(F.count(F.lit(1)).alias("rows_after"))
    return before.crossJoin(after)
