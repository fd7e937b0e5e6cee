"""End-to-end E2 pipeline query (SURVEY.md §3 E2): the reference's flagship
historical-research ETL as ONE lazy Spark chain — distributed REST-page
ingestion → canonical-id mapping → monthly top-N universe → point-in-time
cutoff join → canonical aggregation.

Reference shape: historical_data_etl.main() (:89-199) runs these as five
eager pandas stages with per-coin fetch loops; here Catalyst sees the whole
lineage, the fetch fans out one task per API page, and the only shuffles are
the universe aggregation and the final canonical groupBy.

No DuckDB oracle — the source is the (deterministic) synthetic fetcher, not
a parquet table; `tests/test_pipeline_e2e.py` instead recomputes expected
cells independently in pandas from the same fetcher (a Python oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..aggregates import canonical_aggregate
from ..relational import canonicalize, pit_cutoff_join
from ..sources import fetch_history_distributed
from ..universe import monthly_top_n
from . import register

#: pipeline config — tickers with a deterministic synthetic history; the
#: *_alt coins are exchange-specific duplicates folded into their canonical
#: id (the reference's canonical_map, historical_data_etl.py:179-185).
COINS = ["btc", "btc_alt", "eth", "eth_alt", "sol", "ada", "dot", "link"]
CANONICAL_MAP = {"btc_alt": "btc", "eth_alt": "eth"}
N_DAYS = 240
UNIVERSE_N = 5


@register("market_history_pipeline")
def market_history_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end: ingest → canonicalize → universe → PIT → aggregate.

    ``sf_dir`` is unused — the input is the REST-shaped source itself
    (`sources.fetch_history_distributed`), which is the point: this query's
    scan IS the connector. Output: one row per (canonical_id, month, day)
    with volume summed across members and OHLC-style values taken from the
    max-mcap member (native id first).
    """
    fact = fetch_history_distributed(spark, COINS, n_days=N_DAYS)
    fact = canonicalize(fact, "coin_id", CANONICAL_MAP,
                        out_col="canonical_id")

    # monthly top-N canonical ids by mean market cap (universe build,
    # A3+W1+O3). A canonical's daily cap is its MAX member listing, not the
    # SUM: btc/btc_alt are duplicate listings of ONE asset, so summing
    # would double-weight dual-listed coins in the ranking (r5 review) —
    # the same max-member convention canonical_aggregate applies one stage
    # later via priority_col.
    canon_daily = (fact.groupBy("canonical_id", "day")
                   .agg(F.max("market_cap").alias("mcap")))
    universe = (monthly_top_n(canon_daily, "day", "canonical_id", "mcap",
                              n=UNIVERSE_N)
                .select(F.col("month"),
                        F.col("canonical_id").alias("u_id")))

    # PIT cutoff: a member contributes to month m only with data up to m
    pit = pit_cutoff_join(fact, universe, fact_key="canonical_id",
                          fact_date="day", uni_key="u_id",
                          uni_month="month")

    # The PIT panel is keyed by (month, day): a fact row joins every month
    # whose cutoff covers it, so aggregating on (canonical, day) alone would
    # multi-count volumes across month slices. canonical_aggregate takes one
    # date key — pass the composite as a struct and unpack after.
    agg = canonical_aggregate(
        pit.withColumn("member_id", F.col("coin_id"))
           .withColumn("__md", F.struct(F.col("month"), F.col("day"))),
        canonical_col="canonical_id", member_col="member_id",
        date_col="__md", value_cols=["price"], sum_cols=["volume"],
        priority_col="market_cap", count_alias="n_members",
    )
    return agg.select(
        "canonical_id",
        F.col("__md.month").alias("month"),
        F.col("__md.day").alias("day"),
        F.round("price", 6).alias("price"),
        F.round("volume", 2).alias("volume"),
        "n_members")


@register("live_world_refresh")
def live_world_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 live re-snapshot (reference live_data_pipeline.py:100-137): the
    whole-world recompute — latest-day top-N universe → members' full
    history → canonical aggregation → snapshot-date stamp. ``sf_dir``
    unused (connector-sourced, like market_history_pipeline); rows-only
    check, the overwrite-idempotency behavior is pinned in
    tests/test_live_refresh.py."""
    from ..live import live_world

    return live_world(spark, COINS, n_days=60, top_n=UNIVERSE_N,
                      canonical_map=CANONICAL_MAP)
