"""Data quality gate: validate → standardize → filter → circuit-break
(SURVEY.md §3 E3; reference: all-etl-pipelines/data_quality_gate.py:63-117).

The reference gate: (1) required-column check, raise on missing (:32-36);
(2) precision standardization — round prices to 16 dp (:38-44); (3) drop rows
whose close lies outside [low−tol, high+tol] (:46-61); (4) circuit breaker —
abort the pipeline when row loss exceeds a threshold (default 5%, :30,
:101-110).

Spark shape: the breaker forces ONE eager action mid-pipeline (a count
aggregate) — an intentional materialization barrier. Everything else stays
lazy. At 100 TB the two counts are map-side partial ``count(1)`` aggregates
over the same scan (Catalyst reuses the exchange under AQE), not two full
passes over Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .relational import ohlc_violation
from .schema import validate_schema

DEFAULT_MAX_LOSS_PCT = 5.0  # reference: data_quality_gate.py:30
PRICE_DECIMALS = 16         # reference: data_quality_gate.py:26,43


class CircuitBreakerTripped(RuntimeError):
    """Raised when the gate would drop more than ``max_loss_pct`` of rows —
    the Spark analog of the reference's ``sys.exit(1)``
    (data_quality_gate.py:107-110)."""


def standardize_precision(df: DataFrame, cols: Sequence[str],
                          decimals: int = PRICE_DECIMALS) -> DataFrame:
    """Round price columns to a fixed precision (reference :38-44)."""
    return df.withColumns({c: F.round(F.col(c), decimals) for c in cols})


def apply_gate(df: DataFrame,
               required: Sequence[str],
               price_cols: Sequence[str],
               violation: Column | None = None,
               max_loss_pct: float = DEFAULT_MAX_LOSS_PCT,
               decimals: int = PRICE_DECIMALS) -> DataFrame:
    """Full gate. Returns the cleaned DataFrame or raises
    :class:`CircuitBreakerTripped` / ``ValueError`` (missing columns)."""
    validate_schema(df, required)
    df = standardize_precision(df, price_cols, decimals)
    cond = ohlc_violation() if violation is None else violation
    # Null-price rows make the raw predicate NULL: sum(cast) would not count
    # them but filter(~cond) would silently DROP them — rows vanishing
    # without contributing to the breaker's loss percentage. Normalize to
    # False (pandas parity: NaN comparisons are False, rows are kept).
    cond = F.coalesce(cond, F.lit(False))
    stats = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(cond.cast("long")).alias("bad"),
    ).collect()[0]
    total, bad = stats["total"], stats["bad"] or 0
    loss_pct = 100.0 * bad / total if total else 0.0
    if loss_pct > max_loss_pct:
        raise CircuitBreakerTripped(
            f"data loss {loss_pct:.2f}% > {max_loss_pct}% ({bad}/{total} rows)")
    return df.filter(~cond)


def gate_report(df: DataFrame, violation: Column,
                max_loss_pct: float = DEFAULT_MAX_LOSS_PCT) -> DataFrame:
    """Single-row gate summary (total/violations/loss%/would-trip) as a
    DataFrame — the queryable form of the breaker decision, built ON TOP of
    ``aggregates.violation_loss`` rather than re-implementing its trio (r5
    review finding: two verbatim copies had to receive the NULL-predicate
    fix twice). Empty input reports loss 0.0 / tripped false, agreeing with
    apply_gate's decision."""
    from .aggregates import violation_loss

    return violation_loss(df, violation).withColumn(
        "breaker_tripped", F.col("loss_pct") > max_loss_pct)
