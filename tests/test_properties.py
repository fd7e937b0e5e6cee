"""Property-based tests (hypothesis): operator semantics on randomized
inputs, checked against independent pandas recomputations. Few examples per
property (each example is a Spark job); the value is the input-space
coverage pytest fixtures can't give — ragged groups, ties, gap edges,
shuffled input order.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.aggregates import (agg_dict,
                                                            canonical_aggregate)
from data_engineering_etl_pipeline_spark.streaming import sessionize_batch

SET = settings(max_examples=12, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

# (user, minutes-offset, value) event streams
events_strategy = st.lists(
    st.tuples(st.integers(0, 2),                 # user_id
              st.integers(0, 600),               # minutes offset
              st.integers(-5, 5)),               # value
    min_size=1, max_size=40)


@SET
@given(events=events_strategy)
def test_sessionization_properties(spark, events):
    gap = 30
    base = datetime.datetime(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(minutes=m), float(v))
            for u, m, v in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(df, "user_id", "ts", gap_minutes=gap).toPandas()

    # sessions partition the events exactly
    assert out["n_events"].sum() == len(rows)

    # independent oracle: sort per user, split where gap exceeds threshold
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    want_sessions = 0
    for _, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().tolist()
        want_sessions += 1 + sum(
            (b - a).total_seconds() > gap * 60 for a, b in zip(ts, ts[1:]))
    assert len(out) == want_sessions

    # session bounds are consistent and non-overlapping per user
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (g["session_start"] <= g["session_end"]).all()
        gaps = (g["session_start"].iloc[1:].reset_index(drop=True)
                - g["session_end"].iloc[:-1].reset_index(drop=True))
        assert (gaps > pd.Timedelta(minutes=gap)).all()


members_strategy = st.lists(
    st.tuples(st.integers(0, 1),        # canonical group
              st.integers(0, 4),        # member id
              st.integers(0, 1),        # day index
              st.floats(0, 100, allow_nan=False, width=32),   # value
              st.floats(0, 1000, allow_nan=False, width=32)), # priority (mcap)
    min_size=1, max_size=30)


@SET
@given(members=members_strategy)
def test_canonical_aggregate_properties(spark, members):
    rows = [(c, m, d, float(v), float(p)) for c, m, d, v, p in members]
    df = spark.createDataFrame(
        rows, "canonical_id long, member_id long, d long, val double, prio double")
    out = canonical_aggregate(
        df, canonical_col="canonical_id", member_col="member_id",
        date_col="d", value_cols=["val"], sum_cols=["prio"],
        priority_col="prio", count_alias="n").toPandas()

    pdf = pd.DataFrame(rows, columns=["canonical_id", "member_id", "d",
                                      "val", "prio"])
    for _, r in out.iterrows():
        g = pdf[(pdf["canonical_id"] == r["canonical_id"])
                & (pdf["d"] == r["d"])]
        assert r["n"] == len(g)
        assert r["prio"] == pytest.approx(g["prio"].sum())
        native = g[g["member_id"] == g["canonical_id"]]
        if len(native):
            # native pick: highest (prio, member) among native rows
            cand = native.sort_values(["prio", "member_id"]).iloc[-1]
        else:
            cand = g.sort_values(["prio", "member_id"]).iloc[-1]
        assert r["val"] == pytest.approx(cand["val"])
    # every (canonical, d) combination appears exactly once
    assert len(out) == len(pdf[["canonical_id", "d"]].drop_duplicates())


@SET
@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50),
                               st.floats(-10, 10, allow_nan=False, width=32)),
                     min_size=1, max_size=30),
       seed=st.integers(0, 5))
def test_agg_dict_last_is_order_insensitive(spark, rows, seed):
    """pandas 'last' depends on insertion order; agg_dict with an order_col
    must give identical results no matter how the input rows arrive."""
    import random as _r
    data = [(k, o, float(v), i) for i, (k, o, v) in enumerate(rows)]
    shuffled = data[:]
    _r.Random(seed).shuffle(shuffled)
    schema = "k long, ord long, v double, uniq long"
    rules = {"v": "last", "uniq": "first"}

    def run(d):
        df = spark.createDataFrame(d, schema)
        df = df.withColumn("__o", F.struct("ord", "uniq"))
        return sorted(map(tuple, agg_dict(df, ["k"], rules, order_col="__o")
                          .collect()))

    assert run(data) == run(shuffled)
