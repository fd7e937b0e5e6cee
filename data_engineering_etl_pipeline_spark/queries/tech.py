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


# DuckDB oracle for the EMA/Wilder recurrences: a recursive CTE stepping one
# row per entity per iteration. Floating-point parity notes (hard-won):
# - pandas ewm(adjust=False) computes y_t = (1-a)*y_{t-1} + a*x_t in exactly
#   that op order (verified bit-equal against pandas 2.2);
# - the constants MUST be derived by double division (CAST(2 AS DOUBLE)/13):
#   a 17-digit decimal literal parses as DECIMAL and its DECIMAL→DOUBLE
#   conversion lands 1 ulp off Python's float, which after ~600 recurrence
#   steps flips ROUND(x, 6) on a handful of rows.
_A_W = "(CAST(1 AS DOUBLE)/14)"          # Wilder alpha (RSI/ATR)
_A0_W = "(CAST(1 AS DOUBLE) - CAST(1 AS DOUBLE)/14)"
_A_12 = "(CAST(2 AS DOUBLE)/13)"         # EMA span 12
_A0_12 = "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/13)"
_A_26 = "(CAST(2 AS DOUBLE)/27)"         # EMA span 26
_A0_26 = "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/27)"
_A_9 = "(CAST(2 AS DOUBLE)/10)"          # EMA span 9 (signal)
_A0_9 = "(CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/10)"

_TA_ORACLE_SQL = f"""
WITH RECURSIVE base AS (
  SELECT l_suppkey AS suppkey, l_orderkey, l_linenumber,
         l_extendedprice AS close,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
  FROM lineitem
),
rec AS (
  SELECT suppkey, rn, l_orderkey, l_linenumber, close,
         CAST(NULL AS DOUBLE) AS avg_gain,
         CAST(NULL AS DOUBLE) AS avg_loss,
         close AS ema12, close AS ema26,
         CAST(0.0 AS DOUBLE) AS sig,
         CAST(NULL AS DOUBLE) AS atr
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.suppkey, b.rn, b.l_orderkey, b.l_linenumber, b.close,
    CASE WHEN r.rn = 1 THEN GREATEST(b.close - r.close, CAST(0 AS DOUBLE))
         ELSE {_A0_W} * r.avg_gain
              + {_A_W} * GREATEST(b.close - r.close, CAST(0 AS DOUBLE)) END,
    CASE WHEN r.rn = 1 THEN GREATEST(r.close - b.close, CAST(0 AS DOUBLE))
         ELSE {_A0_W} * r.avg_loss
              + {_A_W} * GREATEST(r.close - b.close, CAST(0 AS DOUBLE)) END,
    {_A0_12} * r.ema12 + {_A_12} * b.close,
    {_A0_26} * r.ema26 + {_A_26} * b.close,
    {_A0_9} * r.sig + {_A_9} * (({_A0_12} * r.ema12 + {_A_12} * b.close)
                                - ({_A0_26} * r.ema26 + {_A_26} * b.close)),
    CASE WHEN r.rn = 1 THEN ABS(b.close - r.close)
         ELSE {_A0_W} * r.atr + {_A_W} * ABS(b.close - r.close) END
  FROM rec r JOIN base b ON b.suppkey = r.suppkey AND b.rn = r.rn + 1
)
SELECT suppkey AS l_suppkey, l_orderkey, l_linenumber,
  ROUND(CASE WHEN rn < 15 THEN NULL
             WHEN avg_loss = 0 AND avg_gain = 0 THEN NULL
             WHEN avg_loss = 0 THEN CAST(100 AS DOUBLE)
             ELSE CAST(100 AS DOUBLE) - CAST(100 AS DOUBLE)
                  / (CAST(1 AS DOUBLE) + avg_gain / avg_loss) END, 6) AS rsi_14,
  ROUND(ema12 - ema26, 6) AS macd,
  ROUND(sig, 6) AS macd_signal,
  ROUND(CASE WHEN rn >= 15 THEN atr END, 6) AS atr_14
FROM rec
"""


@register("supplier_ta_indicators", oracle=_TA_ORACLE_SQL)
def supplier_ta_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9/W10/W12 RSI-14 / MACD(12,26,9) / ATR-14 via the grouped Arrow
    kernel (reference feature_calculation_functions.py:44-92). Wilder/EMA
    recurrences carry infinite-memory per-entity state → applyInPandas.
    Oracle: DuckDB recursive CTE replicating the recurrences bit-exactly
    (see _TA_ORACLE_SQL notes); kernel additionally validated in tests
    against closed-form cases and the native Bollinger twin."""
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
