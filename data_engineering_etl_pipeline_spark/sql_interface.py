"""SQL-text interface: the star schema as temp views + ``spark.sql``.

The reference has no SQL layer (every query is a pandas script); on Spark
the same engine serves both APIs — a SQL string and the DataFrame chain
compile to identical Catalyst plans. This module is the thin registration
shim; `queries/sqlq.py` registers a query expressed PURELY as SQL text to
pin that parity (its DuckDB oracle is nearly the same string — the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import STAR_TABLES, load_table


def register_star_views(spark: SparkSession, sf_dir: str,
                        tables=STAR_TABLES) -> None:
    """Create/replace one temp view per star table (idempotent; views are
    lazy — no data moves until a query runs)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: last-registered sf_dir per Spark application — registration is
#: memoized (ten driver-side schema reads per call otherwise) but
#: re-runs whenever the TARGET sf_dir changes, so views never go stale
#: across scale factors in one session (r5 review finding).
_REGISTERED: dict[str, str] = {}


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    app = spark.sparkContext.applicationId
    if _REGISTERED.get(app) != sf_dir:
        register_star_views(spark, sf_dir)
        _REGISTERED[app] = sf_dir
    return spark.sql(sql)
