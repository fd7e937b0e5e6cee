"""Queries expressed as pure SQL text over the registered star views —
pinning DataFrame/SQL parity (same Catalyst plan either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sql_interface import run_sql
from . import register

_REVENUE_SQL = """
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS yr,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1993-01-01'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
"""


@register(
    "sql_nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS yr,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1993-01-01'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join revenue rollup as SQL TEXT through ``spark.sql`` (the
    DuckDB oracle is the same string modulo dialect) — the engine's SQL
    front door. Catalyst broadcasts the dims and pushes the date filter
    exactly as it does for the DataFrame form (tests/test_plans.py family).
    """
    return run_sql(spark, sf_dir, _REVENUE_SQL)
