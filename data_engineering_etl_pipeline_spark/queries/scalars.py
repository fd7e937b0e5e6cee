"""Scalar-function & classifier queries (SURVEY.md §2.8 F1-F18, §2.10 UD5):
date arithmetic, string functions, null handling, and the precedence
taxonomy classifier — all native column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..relational import canonicalize
from ..taxonomy import classify_scalar_by_keywords
from . import register

# Precedence-ordered taxonomy over part types (star-schema analog of the
# reference's crypto category taxonomy, cg_attributes…py:45-80). Classified
# per-row inside scalar_function_suite (UD5); the former standalone
# `part_taxonomy` aggregate row was retired in the r4 registry consolidation.
_PART_TAXONOMY = [
    ("Premium Metal", ["STEEL", "COPPER"]),
    ("Coated", ["ANODIZED", "PLATED", "POLISHED"]),
    ("Finished", ["BRUSHED", "BURNISHED"]),
]


@register(
    "scalar_function_suite",
    oracle="""
    SELECT 'orders' AS src, o_orderkey AS row_id,
           CAST(o_orderdate AS DATE) AS d,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           strftime(o_orderdate, '%Y-%m-01') AS month_key,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           NULL AS brand_u, CAST(NULL AS INT) AS name_len,
           CAST(NULL AS BOOLEAN) AS is_brushed, NULL AS first_word,
           CAST(NULL AS INT) AS n_vowels, CAST(NULL AS DOUBLE) AS price_round,
           NULL AS standard_category
    FROM orders
    UNION ALL
    SELECT 'part' AS src, p_partkey AS row_id,
           CAST(NULL AS DATE) AS d, CAST(NULL AS INT) AS yr,
           CAST(NULL AS INT) AS mo, CAST(NULL AS INT) AS qtr,
           NULL AS month_key, CAST(NULL AS DATE) AS month_start,
           CAST(NULL AS BIGINT) AS epoch_s,
           upper(p_brand) AS brand_u,
           CAST(length(p_name) AS INT) AS name_len,
           contains(p_type, 'BRUSHED') AS is_brushed,
           string_split(p_name, ' ')[1] AS first_word,
           CAST(length(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS INT) AS n_vowels,
           round(p_retailprice, 0) AS price_round,
           CASE
             WHEN contains(p_type, 'STEEL') OR contains(p_type, 'COPPER')
               THEN 'Premium Metal'
             WHEN contains(p_type, 'ANODIZED') OR contains(p_type, 'PLATED')
                  OR contains(p_type, 'POLISHED')
               THEN 'Coated'
             WHEN contains(p_type, 'BRUSHED') OR contains(p_type, 'BURNISHED')
               THEN 'Finished'
             ELSE 'Other'
           END AS standard_category
    FROM part
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F12/F16 scalar-function suite plus the UD5 precedence taxonomy in
    one registry row (r3/r4 VERDICT consolidation: the former
    ``order_date_parts`` + ``part_string_funcs`` + ``part_taxonomy`` rows
    merged to free registry slots under the driver's 50-entry cap; the
    classifier is checked per-row here — strictly stronger than the retired
    per-class aggregate).

    Date family on orders (reference pd.to_datetime().dt
    pipeline_helpers.py:213,243; month truncation universe…py:153;
    'YYYY-MM-01' formatting universe…py:170; epoch arithmetic :223-238 —
    UTC session TZ keeps epoch values oracle-identical) united by name with
    the string/math family on part (upper/length/contains/split-index/regex/
    round — reference historical_data_etl.py:120, cg_attributes…py:100,
    test_data_integrity.py:86). The union itself is U1/A11
    (unionByName(allowMissingColumns=True), the reference's pd.concat of
    heterogeneous per-source frames with null-filled missing columns)."""
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    dates = o.select(
        F.lit("orders").alias("src"),
        F.col("o_orderkey").alias("row_id"),
        F.to_date("o_orderdate").alias("d"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM-01").alias("month_key"),
        F.trunc("o_orderdate", "MM").alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )
    strings = p.select(
        F.lit("part").alias("src"),
        F.col("p_partkey").alias("row_id"),
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").cast("int").alias("name_len"),
        F.col("p_type").contains("BRUSHED").alias("is_brushed"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.length(F.regexp_replace("p_name", "[^aeiou]", "")).cast("int").alias("n_vowels"),
        F.round("p_retailprice", 0).alias("price_round"),
        classify_scalar_by_keywords("p_type", _PART_TAXONOMY, default="Other")
        .alias("standard_category"),
    )
    return dates.unionByName(strings, allowMissingColumns=True)


@register(
    "customer_null_handling",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
      FROM customer
    ), mapped AS (
      SELECT *,
             COALESCE(CASE c_mktsegment WHEN 'BUILDING' THEN 'B2B'
                                        WHEN 'AUTOMOBILE' THEN 'CONSUMER'
                      END, c_mktsegment) AS segment_canon,
             COALESCE(bal_or_null, 0.0) AS bal_filled
      FROM base
    )
    SELECT segment_canon,
           COUNT(*) AS n,
           CAST(COUNT(CASE WHEN bal_or_null IS NULL THEN 1 END) AS BIGINT) AS n_null,
           ROUND(SUM(bal_filled), 2) AS sum_filled,
           ROUND(AVG(bal_or_null), 4) AS avg_nonnull
    FROM mapped GROUP BY 1
    """,
)
def customer_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9/P11/F17/F18 null-handling family: conditional nulling, dict-map
    canonicalization with fallback (reference col.map(m).fillna(col),
    historical_data_etl.py:186), fillna-zero, and null-skipping aggregation
    (Spark avg ignores nulls like pandas mean skipna)."""
    c = load_table(spark, sf_dir, "customer")
    base = c.withColumn(
        "bal_or_null",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")))
    mapped = canonicalize(
        base, "c_mktsegment",
        {"BUILDING": "B2B", "AUTOMOBILE": "CONSUMER"},
        out_col="segment_canon")
    mapped = mapped.withColumn("bal_filled", F.coalesce("bal_or_null", F.lit(0.0)))
    return (
        mapped.groupBy("segment_canon")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("bal_or_null").isNull(), 1)).alias("n_null"),
            F.round(F.sum("bal_filled"), 2).alias("sum_filled"),
            F.round(F.avg("bal_or_null"), 4).alias("avg_nonnull"),
        )
    )


