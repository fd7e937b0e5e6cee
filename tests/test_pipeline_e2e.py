"""E2 end-to-end pipeline test (SURVEY.md §3 E2): the Spark chain's cells are
recomputed independently in pandas from the SAME deterministic fetcher — a
Python oracle where no SQL one can exist (the source is a connector, not a
table).
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.queries.pipeline import (
    CANONICAL_MAP, COINS, N_DAYS, UNIVERSE_N, market_history_pipeline)
from data_engineering_etl_pipeline_spark.sources import (_EPOCH_DAY0,
                                                         synthetic_fetch)


@pytest.fixture(scope="module")
def result(spark):
    return market_history_pipeline(spark, "unused").toPandas()


def _pandas_world() -> pd.DataFrame:
    rows = []
    for c in COINS:
        rows.extend(synthetic_fetch(c, _EPOCH_DAY0, N_DAYS))
    df = pd.DataFrame(rows, columns=["coin_id", "day", "price", "volume",
                                     "market_cap"])
    df["canonical_id"] = df["coin_id"].map(CANONICAL_MAP).fillna(df["coin_id"])
    df["month"] = df["day"].map(lambda d: d.replace(day=1))
    return df


def test_pipeline_shape_and_membership(result):
    assert set(result.columns) == {"canonical_id", "month", "day", "price",
                                   "volume", "n_members"}
    assert len(result) > 0
    # per month at most UNIVERSE_N canonical ids
    per_month = result.groupby("month")["canonical_id"].nunique()
    assert (per_month <= UNIVERSE_N).all()
    # PIT: no row may carry a day after its month cutoff
    assert (result["day"] <= result["month"]).all()
    # alt coins are always folded away
    assert not set(result["canonical_id"]) & set(CANONICAL_MAP)


def test_pipeline_cells_match_python_oracle(result):
    world = _pandas_world()

    # oracle universe: monthly top-N canonical ids by avg of daily MAX-member
    # mcap (duplicate listings of one asset must not double-weight it — r5)
    daily = (world.groupby(["canonical_id", "day"], as_index=False)
             .agg(mcap=("market_cap", "max")))
    daily["month"] = daily["day"].map(lambda d: d.replace(day=1))
    monthly = (daily.groupby(["month", "canonical_id"], as_index=False)
               .agg(agg_value=("mcap", "mean")))
    monthly["agg_value"] = monthly["agg_value"].round(4)
    monthly["rank"] = (monthly.sort_values(
        ["month", "agg_value", "canonical_id"],
        ascending=[True, False, True])
        .groupby("month").cumcount() + 1)
    top = monthly[monthly["rank"] <= UNIVERSE_N][["month", "canonical_id"]]
    # PIT: a month survives only if any member data exists up to its cutoff
    # (the first calendar month's 1st precedes all data, so it drops)
    top = top[top["month"] > world["day"].min()]

    got_members = set(map(tuple, result[["month", "canonical_id"]]
                          .drop_duplicates().itertuples(index=False)))
    want_members = set(map(tuple, top.itertuples(index=False)))
    assert got_members == want_members

    # canonical btc on a specific day inside a member month: volume sums
    # btc + btc_alt; price comes from the native (btc) member
    some = result[(result["canonical_id"] == "btc")].iloc[0]
    day = some["day"]
    w = world[(world["canonical_id"] == "btc") & (world["day"] == day)]
    assert some["volume"] == pytest.approx(round(w["volume"].sum(), 2))
    native_price = w.loc[w["coin_id"] == "btc", "price"].iloc[0]
    assert some["price"] == pytest.approx(round(native_price, 6))
    assert some["n_members"] == len(w)


def test_pipeline_n_members_counts_alt_coins(result):
    # btc/eth have an alt member (2), sol/ada/dot/link do not (1)
    mx = result.groupby("canonical_id")["n_members"].max().to_dict()
    for cid, n in mx.items():
        assert n == (2 if cid in {"btc", "eth"} else 1)


def test_registry_within_driver_check_budget():
    """The round driver verifies at most the FIRST 50 registered queries
    (r2 VERDICT: entries past the cap silently lose driver verification).
    Pin the budget, and pin that the oracle keys are a subset of queries."""
    from data_engineering_etl_pipeline_spark.queries import ORACLES, QUERIES

    assert len(QUERIES) <= 50, (
        f"{len(QUERIES)} registered queries exceed the driver's 50-entry "
        "check budget — curate the registry (consolidate or retire rows)")
    assert set(ORACLES) <= set(QUERIES)


def test_readme_counts_match_registry():
    """README's registered/oracle counts are pinned to the registry so docs
    cannot drift from code (r2 VERDICT item 4)."""
    import os
    import re

    from data_engineering_etl_pipeline_spark.queries import ORACLES, QUERIES

    readme = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "README.md")).read()
    m = re.search(r"(\d+) registered queries", readme)
    assert m and int(m.group(1)) == len(QUERIES)
    m = re.search(r"(\d+) of the (\d+)\s+registered queries have oracles", readme)
    assert m, "README oracle-count sentence missing"
    assert int(m.group(1)) == len(ORACLES)
    assert int(m.group(2)) == len(QUERIES)


def test_bench_calibration_stability_flag():
    """r9 VERDICT item 3: a BENCH record captured under a drifting host
    (the r9 driver record: sentinel 1.625s -> 0.459s, 3.5x intra-run)
    must carry calibration_unstable + re-run guidance; a stable record
    carries only the ratio. Symmetric in drift direction; a zero
    sentinel (clock glitch) flags rather than dividing by zero."""
    import bench

    stable = bench.calibration_stability(1.0, 1.1)
    assert stable == {"calibration_ratio": 1.1}
    drifted = bench.calibration_stability(1.625, 0.459)
    assert drifted["calibration_unstable"] is True
    assert drifted["calibration_ratio"] == round(1.625 / 0.459, 3)
    assert "re-run" in drifted["calibration_note"]
    assert bench.calibration_stability(0.459, 1.625)[
        "calibration_unstable"] is True
    assert bench.calibration_stability(0.0, 1.0)[
        "calibration_unstable"] is True
    # boundary: exactly the threshold is still stable (1.25 since r11 —
    # r10 VERDICT item 4: the r10 record's 1.294 drift must now flag)
    assert "calibration_unstable" not in bench.calibration_stability(
        1.25, 1.0)
    assert bench.calibration_stability(0.749, 0.579)[
        "calibration_unstable"] is True
    # r12 multi-point form: a mid-run storm the endpoints straddle must
    # flag (the r12 finding: a row inflated 2.6x under endpoint ratio
    # 1.06), and an all-quiet path must not
    mid = bench.calibration_stability(0.5, 0.52, 1.9, 0.51)
    assert mid["calibration_unstable"] is True
    assert "1.9s" in mid["calibration_note"]
    assert "calibration_unstable" not in bench.calibration_stability(
        0.5, 0.52, 0.55, 0.51)


def test_bench_and_smoke_names_exist_in_registry():
    """bench.py and scale_smoke.py run registry queries by name; a registry
    consolidation that renames a row must update them or the driver's
    per-round bench crashes with a KeyError (this bit r4: two retired names
    survived in bench.py)."""
    import os
    import re

    from data_engineering_etl_pipeline_spark.queries import QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import bench
    missing = [n for n in bench.BENCH_QUERIES + bench.TAIL_QUERIES
               if n not in QUERIES]
    assert not missing, f"bench.py references unknown queries: {missing}"

    src = open(os.path.join(root, "scripts", "scale_smoke.py")).read()
    # every string inside a `queries = [...]` literal must resolve
    for block in re.findall(r"queries\s*=\s*\[([^\]]+)\]", src):
        names = re.findall(r'"([a-z0-9_]+)"', block)
        assert names, "scale_smoke queries list went empty/unparseable"
        missing = [n for n in names if n not in QUERIES]
        assert not missing, (
            f"scale_smoke.py references unknown queries: {missing}")
