"""Point-in-time universe machinery (SURVEY.md §2 A3+W1+O3, P6/J9; §7.2).

The reference builds a monthly top-N membership map: rank candidates by
monthly mean market cap, keep the top N, store ``{month: [ids]}``
(universe_generation_pipeline.py:146-179), then assembles point-in-time
histories by slicing each member's history at each month
(historical_data_etl.py:154-168).

Spark-first: the universe is a small relational table ``(month, member_id,
rank)`` — broadcastable everywhere it is consumed — and PIT assembly is a
broadcast theta join (relational.pit_cutoff_join). The flagship query
(§7.2): monthly top-N customers by average order value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import top_k_per_group


def monthly_top_n(df: DataFrame, date_col: str, id_col: str, value_col: str,
                  n: int, agg: str = "avg") -> DataFrame:
    """Monthly top-N members by aggregated value.

    Plan shape: one hash-agg shuffle on ``(month, id)`` (map-side partial agg
    first), then one window shuffle on ``month`` for row_number — both tiny
    after aggregation, regardless of fact-table size. Deterministic
    tiebreak on ``id`` mirrors pandas rank(method='first') on stable input
    (reference: universe_generation_pipeline.py:159-161; SURVEY §7.4 h3).
    Output: ``month (date), <id_col>, agg_value, rank``.
    """
    agg_fn = {"avg": F.avg, "mean": F.avg, "sum": F.sum}[agg]
    monthly = (
        df.withColumn("month", F.trunc(F.col(date_col), "MM"))
        .groupBy("month", id_col)
        .agg(F.round(agg_fn(F.col(value_col)), 4).alias("agg_value"))
    )
    return (
        top_k_per_group(monthly, ["month"], "agg_value", n,
                        tiebreak=[id_col], rank_col="rank")
        .select("month", id_col, "agg_value", "rank")
    )


def universe_to_json(universe: DataFrame, path: str, id_col: str,
                     month_col: str = "month") -> None:
    """S3: persist the universe as the reference's ``{\"YYYY-MM-01\": [ids]}``
    JSON shape (universe_generation_pipeline.py:167-179). The universe is
    months × top-N — KB-scale — so this is a deliberate driver-side write;
    the relational (month, id) table stays the compute-side representation.
    """
    import json

    rows = (universe.groupBy(month_col)
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
            .collect())
    if any(r[0] is None for r in rows):
        # a NULL month (e.g. NULL fact dates surviving trunc) would crash
        # strftime mid-write after truncating the output file — fail BEFORE
        # opening it, with the actual cause (r5 review finding)
        raise ValueError(
            "universe_to_json: NULL month group in the universe — "
            "filter NULL dates upstream")
    mapping = {
        (m.strftime("%Y-%m-%d") if hasattr(m, "strftime") else str(m)):
        list(ids) for m, ids in ((r[0], r[1]) for r in rows)}
    with open(path, "w") as f:
        json.dump(mapping, f, indent=2, sort_keys=True)


def universe_from_json(spark, path: str, id_col: str,
                       month_col: str = "month",
                       id_type: str = "string") -> DataFrame:
    """S3 inverse: ``{month: [ids]}`` JSON → (month, id) table, the shape the
    PIT join consumes (historical_data_etl.py:111-132). ``id_type`` must
    match the fact table\'s id column type (e.g. ``'bigint'`` for the
    flagship o_custkey universe): the former hardcoded string schema
    crashed on integer-id JSON and, coerced, would silently change the
    PIT join\'s key type (r5 review finding)."""
    import json

    with open(path) as f:
        mapping = json.load(f)
    rows = [(m, i) for m, ids in mapping.items() for i in ids]
    df = spark.createDataFrame(rows, f"{month_col} string, {id_col} {id_type}")
    return df.withColumn(month_col, F.to_date(F.col(month_col)))
