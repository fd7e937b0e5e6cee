"""Technical-indicator queries (SURVEY.md §2.5 W9-W12): native Bollinger
(oracle-checked — SMA-based, a true window expression) and the
recurrence indicators RSI/MACD/ATR via the applyInPandas kernel (rows-only:
EMA recurrences are not ANSI-SQL-expressible; the kernel is cross-checked
against its native Bollinger twin in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..ta import ta_features
from ..windows import rolling_mean, rolling_std, w_entity
from . import register


@register(
    "supplier_bollinger",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(CASE WHEN COUNT(l_extendedprice) OVER w20 >= 20
                      THEN AVG(l_extendedprice) OVER w20 END, 4) AS bb_mid,
           ROUND(CASE WHEN COUNT(l_extendedprice) OVER w20 >= 20
                      THEN AVG(l_extendedprice) OVER w20
                           + 2 * STDDEV_SAMP(l_extendedprice) OVER w20 END, 4) AS bb_upper,
           ROUND(CASE WHEN COUNT(l_extendedprice) OVER w20 >= 20
                      THEN AVG(l_extendedprice) OVER w20
                           - 2 * STDDEV_SAMP(l_extendedprice) OVER w20 END, 4) AS bb_lower
    FROM lineitem
    WINDOW w20 AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
)
def supplier_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 Bollinger bands natively (SMA ± 2σ over a 20-row frame with
    pandas min_periods gating) — the reference's talib.BBANDS
    (feature_calculation_functions.py:63-69) as pure window expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    w = w_entity("l_suppkey", ["l_shipdate", "l_orderkey", "l_linenumber"])
    mid = rolling_mean("l_extendedprice", 20, w)
    sd = rolling_std("l_extendedprice", 20, w)
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(mid, 4).alias("bb_mid"),
        F.round(mid + 2 * sd, 4).alias("bb_upper"),
        F.round(mid - 2 * sd, 4).alias("bb_lower"),
    )


@register("supplier_ta_indicators")
def supplier_ta_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9/W10/W12 RSI-14 / MACD(12,26,9) / ATR-14 via the grouped Arrow
    kernel (reference feature_calculation_functions.py:44-92). Wilder/EMA
    recurrences carry infinite-memory per-entity state → applyInPandas;
    rows-only driver check, kernel validated in tests against closed-form
    cases and the native Bollinger twin."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity")
    out = ta_features(
        li, entity_col="l_suppkey",
        order_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        close="l_extendedprice")
    return out.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round("rsi_14", 6).alias("rsi_14"),
        F.round("macd", 6).alias("macd"),
        F.round("macd_signal", 6).alias("macd_signal"),
        F.round("atr_14", 6).alias("atr_14"),
    )


@register("media_feature_extract")
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 multimodal plumbing: binary media column → mapInPandas feature
    extraction (deterministic fake decoder — codec libs are stubbed, the
    Spark-side schema/batching/partitioning is real). Rows-only check."""
    from ..extensions.multimodal import extract_features, make_fake_media

    media = make_fake_media(spark, n=64)
    feats = extract_features(media, fake_decode=True)
    return feats.select(
        "media_id", "kind", "feat_dim", "decode_ok",
        F.round(F.element_at("feat", 1), 6).alias("feat0"),
    )


@register("media_frame_sample")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 video frame-sampling plumbing: per-video frame-index explosion
    with bounded fan-out (every_n stride) — the row shape a real
    ffmpeg-backed sampler fills in. Rows-only check; the unit test pins the
    exact fan-out arithmetic."""
    from ..extensions.multimodal import frame_sample_plan, make_fake_media

    media = make_fake_media(spark, n=64)
    return frame_sample_plan(media, every_n=10)
