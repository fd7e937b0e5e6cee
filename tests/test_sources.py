"""REST-shaped source tests (SURVEY.md §2.1 S4-S6, S11): the Python Data
Source and the mapInPandas fetch path must agree bit-for-bit (same pluggable
fetcher), partitioning must follow the page structure, and the retry wrapper
must implement the reference's 3-retry/429-backoff contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.sources import (
    CHUNK_DAYS, SyntheticMarketReader, chunk_table, fetch_history_distributed,
    register_sources, synthetic_fetch, with_retry)


@pytest.fixture(scope="module")
def market_df(spark):
    register_sources(spark)
    return (spark.read.format("synthetic_market_api")
            .option("coins", "btc,eth,sol")
            .option("n_days", "400").load())


def test_datasource_rows_and_schema(market_df):
    assert market_df.columns == ["coin_id", "day", "price", "volume", "market_cap"]
    assert market_df.count() == 3 * 400
    per_coin = dict(market_df.groupBy("coin_id").count().collect())
    assert per_coin == {"btc": 400, "eth": 400, "sol": 400}
    # 365+ days span exactly; all prices positive
    assert market_df.filter(F.col("price") <= 0).count() == 0


def test_datasource_partitions_are_pages():
    reader = SyntheticMarketReader(
        {"coins": "btc,eth,sol", "n_days": "400", "start_day": "19000"})
    parts = reader.partitions()
    # ceil(400/179)=3 chunks per coin
    assert len(parts) == 9
    spans = {(p.coin, p.start_day, p.n_days) for p in parts}
    assert ("btc", 19000, CHUNK_DAYS) in spans
    assert ("btc", 19000 + 2 * CHUNK_DAYS, 400 - 2 * CHUNK_DAYS) in spans
    # chunks tile the range exactly, per coin
    for coin in ("btc", "eth", "sol"):
        total = sum(p.n_days for p in parts if p.coin == coin)
        assert total == 400


def test_datasource_deterministic(spark, market_df):
    again = (spark.read.format("synthetic_market_api")
             .option("coins", "btc,eth,sol")
             .option("n_days", "400").load())
    a = sorted(map(tuple, market_df.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_mapinpandas_fetch_matches_datasource(spark, market_df):
    via_map = fetch_history_distributed(spark, ["btc", "eth", "sol"],
                                        n_days=400)
    a = sorted(map(tuple, market_df.collect()))
    b = sorted(map(tuple, via_map.collect()))
    assert a == b


def test_chunk_table_tiles_range(spark):
    ct = chunk_table(spark, ["a", "b"], start_day=100, n_days=400)
    rows = ct.collect()
    assert len(rows) == 2 * 3
    for coin in ("a", "b"):
        spans = sorted((r.from_day, r.n_days) for r in rows if r.coin_id == coin)
        assert spans[0][0] == 100
        assert sum(n for _, n in spans) == 400
        # contiguous, no overlap
        for (f1, n1), (f2, _) in zip(spans, spans[1:]):
            assert f1 + n1 == f2


def test_retry_backoff_contract():
    calls, sleeps = [], []

    def flaky(x):
        calls.append(x)
        if len(calls) < 3:
            raise RuntimeError("HTTP 429 Too Many Requests")
        return x * 2

    wrapped = with_retry(flaky, retries=3, backoff_s=65.0,
                         sleeper=sleeps.append)
    assert wrapped(21) == 42
    assert len(calls) == 3
    assert sleeps == [65.0, 65.0]

    def always_fails():
        raise ValueError("boom")

    wrapped2 = with_retry(always_fails, retries=3, sleeper=sleeps.append)
    with pytest.raises(ValueError, match="boom"):
        wrapped2()


def test_synthetic_fetch_shape():
    rows = synthetic_fetch("btc", 19000, 5)
    assert len(rows) == 5
    days = [r[1] for r in rows]
    assert days == sorted(days)
    assert all(len(r) == 5 for r in rows)
