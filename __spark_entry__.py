"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (monthly top-N customers by avg order
value, the universe-generation shape, SURVEY.md §7.2) at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL per query (column names/aliases
match exactly; floats rounded identically on both sides so the driver's
order-insensitive value hash is stable across engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_etl_pipeline_spark.queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["monthly_top_customers"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys → rows-only check."""
    return dict(ORACLES)
