"""Learned quality classifier: distributed logistic regression with EXACT
fixed-point gradient accumulation (SURVEY.md north-star extension — the
GPT-3/CCNet-style curated-vs-raw quality filter, trained ON the cluster).

The standard pipeline (GPT-3 appendix A; CCNet; LLaMA) trains a linear
classifier to distinguish a curated reference corpus from raw web text and
keeps documents the classifier scores as reference-like. The features here
are this repo's ``hashed_tfidf_vectors`` output (or any dense
``array<float>`` column), so the whole filter — vectorize → fit → score →
threshold — runs as DataFrame plans.

Exactness contract (shared with ``kmeans_update_exact`` /
``embedding_moments_exact``): each row's gradient contribution is
quantized ``floor(g·2^20)`` to BIGINTs inside the Arrow kernel, and the
cross-row reduce is integer arithmetic — order-independent, so the fitted
weights are BYTE-IDENTICAL under any partitioning, AQE re-plan, or task
retry (float-sum gradient reducers give none of that; retrained models
that differ in ulps flip downstream keep/drop decisions near the
threshold, which at 100 TB means irreproducible corpora). The per-row
sigmoid uses numpy's libm; on a homogeneous cluster (one numpy build) the
per-row values are identical everywhere, which is the only requirement —
the REDUCE never touches floats. Precision of the claim (r7 advisor
finding): the per-row ``x@w`` BLAS gemv is batch-shape-invariant in
practice but not IEEE-guaranteed — ``fit_logreg_exact(dot_mode='fold')``
is the construction-level hatch (fixed index-order accumulation), the
same trade as ``kmeans_lloyd_refine(assign='fold')``.

Why no DuckDB driver-oracle row: the construction needs exp(), and libm
exp differs across engines in the last ulp — a floor() boundary can flip,
so the zero-tolerance hash contract cannot be met cross-engine (the same
documented reason ``incremental_semantic_dedup`` is unit-verified). The
verification surface is the numpy-twin bit-equality + relayout-stability
units in tests/test_classifier.py.

Plan shape per iteration: ONE map-only Arrow kernel pass over the corpus
(weights broadcast in the closure, KB-scale), each batch emitting one
(dim+2)-row partial frame (gradient cells + bias + quantized log-loss);
ONE exchange over dim+2 keys with map-side combine — the reduce is
model-sized at any corpus scale; a dim+2-row driver collect updates the
weights. n_iters full scans total, the same cost envelope as
``kmeans_lloyd_refine``.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _guard_q_magnitude

#: fixed-point scale for exact gradient/loss accumulation
LOGREG_Q_SCALE = 1 << 20


def _fold_gemv(x: "np.ndarray", w: "np.ndarray", b: float) -> "np.ndarray":
    """Fixed-order per-row dot: accumulate coordinates in INDEX order
    (``z += x[:, i]·w_i``), so the per-row value is a deterministic
    left-associated chain regardless of Arrow batch shape — the audit-
    replay hatch for ``dot_mode='fold'`` (the ``kmeans_lloyd_refine``
    ``assign='fold'`` convention). The BLAS gemv default is batch-shape-
    invariant in practice but not IEEE-guaranteed across kernel paths."""
    z = np.full(len(x), float(b), dtype=np.float64)
    for i in range(x.shape[1]):
        z += x[:, i] * w[i]
    return z


def _grad_partials(df: DataFrame, vec_col: str, label_col: str,
                   w: np.ndarray, b: float, dim: int,
                   q_scale: int, decimal_sums: bool = False,
                   dot_mode: str = "gemm") -> DataFrame:
    """One epoch's quantized gradient/loss partials: rows ``(pos, n, s)``
    with pos in [0, dim) the weight gradient cells, pos = dim the bias
    cell, pos = dim+1 the summed quantized log-loss. NULL vectors,
    wrong-length vectors, and NULL labels are excluded."""
    if dot_mode not in ("gemm", "fold"):
        raise ValueError(f"_grad_partials: dot_mode={dot_mode!r} "
                         "(want 'gemm' or 'fold')")
    qf = float(q_scale)
    wl = w.copy()
    bl = float(b)

    def gen(batches):
        for pdf in batches:
            keep = [(v, y) for v, y in zip(pdf[vec_col], pdf[label_col])
                    if v is not None and len(v) == dim and y is not None
                    and not (isinstance(y, float) and math.isnan(y))]
            if not keep:
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v, _ in keep])
            y = np.asarray([float(t) for _, t in keep], dtype=np.float64)
            n = len(x)
            z = (x @ wl + bl if dot_mode == "gemm"
                 else _fold_gemv(x, wl, bl))
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y                                   # dlogloss/dz
            gq = (x * r[:, None]) * qf
            # width = n: every batch row int64-sums into one gradient cell
            # (advisor r7 finding — the per-element check alone lets a
            # 2^55-band element pass while the batch sum wraps); the bias
            # and log-loss sums get the same accumulation-width guard
            _guard_q_magnitude(gq, "fit_logreg_exact", rows=n)
            gw = np.floor(gq).astype(np.int64).sum(axis=0)
            rq = r * qf
            _guard_q_magnitude(rq, "fit_logreg_exact[bias]", rows=n)
            gb = int(np.floor(rq).astype(np.int64).sum())
            # per-row quantized log-loss (clipped for the planted-separable
            # case where p reaches exactly 0/1 in float)
            pc = np.clip(p, 1e-15, 1.0 - 1e-15)
            lq = -(y * np.log(pc) + (1.0 - y) * np.log1p(-pc)) * qf
            _guard_q_magnitude(lq, "fit_logreg_exact[loss]", rows=n)
            ll = np.floor(lq).astype(np.int64).sum()
            yield pd.DataFrame({
                "pos": np.concatenate([np.arange(dim),
                                       [dim, dim + 1]]).astype(np.int32),
                "n": np.int64(n),
                "s": np.concatenate([gw, [gb, int(ll)]]),
            })

    part = df.select(vec_col, label_col).mapInPandas(
        gen, "pos int, n long, s long")
    acc = F.col("s").cast("decimal(38,0)") if decimal_sums else F.col("s")
    return part.groupBy("pos").agg(F.sum("n").alias("n"),
                                   F.sum(acc).alias("sum_q"))


def fit_logreg_exact(df: DataFrame, vec_col: str = "embedding",
                     label_col: str = "label", dim: int = 64,
                     n_iters: int = 20, lr: float = 1.0, l2: float = 0.0,
                     q_scale: int = LOGREG_Q_SCALE,
                     decimal_sums: bool = False,
                     init_weights: list[float] | None = None,
                     init_bias: float = 0.0,
                     tol: float | None = None,
                     patience: int = 1,
                     dot_mode: str = "gemm") -> dict:
    """Full-batch gradient-descent logistic regression over the corpus.

    Full-batch (not SGD) is the deliberate choice: the gradient is a pure
    aggregation, so determinism needs no sample ordering, and at 100 TB
    one pass per step is the same scan the rest of the engine's fits pay.
    Returns ``{"weights", "bias", "losses", "n"}`` where ``losses`` is the
    per-iteration mean log-loss (from the exact quantized sums — itself
    byte-stable, and non-increasing on any data for a small enough lr;
    unit-pinned on the planted fixture).

    ``init_weights``/``init_bias`` are the resume hatch (the
    ``kmeans_lloyd_refine(init_centroids=...)`` convention): the entire
    loop state is the KB-scale model, so a job killed after k of n
    iterations restarts with the last recorded weights and runs the
    remaining n−k — and because every step is exact-deterministic, the
    resumed trajectory is byte-identical to the uninterrupted one
    (unit-pinned).

    ``tol``/``patience`` (r7 VERDICT item 5) — deterministic early stop:
    after ``patience`` consecutive iterations whose INTEGER loss-sum
    improvement falls below ``tol`` (in mean-log-loss units: the
    comparison is ``prev_sum_q − sum_q < tol·n·q_scale`` over exact
    integers, so the stopping decision is byte-stable like everything
    else), the loop breaks WITHOUT applying that iteration's update — the
    returned weights equal a full run truncated at the last applied step
    (unit-pinned). At 100 TB each iteration is a full corpus scan;
    scanning 14 more times after the quantized loss plateaued at
    iteration 6 is real money. Default ``tol=None`` keeps the fixed
    ``n_iters`` schedule.

    Byte-stability precision (r7 advisor finding, the
    ``kmeans_lloyd_refine`` caveat verbatim): the cross-row REDUCE is
    unconditionally order-independent (integers), but the default
    ``dot_mode='gemm'`` per-row ``x@w`` is a BLAS gemv whose value is
    batch-shape-invariant in practice, NOT IEEE-guaranteed across kernel
    paths — a z landing within one ulp of a ``floor(g·2^20)`` boundary
    could in principle flip under a relayout that changes Arrow batch
    shapes. Where the guarantee must be construction-level (audit
    replays), ``dot_mode='fold'`` accumulates each row's dot in fixed
    index order — batch-shape-invariant by construction, same trade as
    ``kmeans_lloyd_refine(assign='fold')``."""
    w = (np.zeros(dim, dtype=np.float64) if init_weights is None
         else np.asarray(init_weights, dtype=np.float64).copy())
    if w.shape != (dim,):
        raise ValueError(f"fit_logreg_exact: init_weights shape "
                         f"{w.shape} != ({dim},)")
    b = float(init_bias)
    losses: list[float] = []
    n = 0
    qf = float(q_scale)
    prev_loss_q: int | None = None
    stall = 0
    for _ in range(max(0, int(n_iters))):
        rows = {r["pos"]: r for r in
                _grad_partials(df, vec_col, label_col, w, b, dim,
                               q_scale, decimal_sums,
                               dot_mode=dot_mode).collect()}
        if not rows:
            raise ValueError("fit_logreg_exact: no labeled vectors to fit")
        n = rows[0]["n"]
        grad = np.asarray([rows[i]["sum_q"] for i in range(dim)],
                          dtype=np.float64) / (n * qf)
        gb = rows[dim]["sum_q"] / (n * qf)
        loss_q = int(rows[dim + 1]["sum_q"])
        losses.append(loss_q / (n * qf))
        if tol is not None and prev_loss_q is not None:
            stall = (stall + 1
                     if float(prev_loss_q - loss_q) < tol * n * qf else 0)
        prev_loss_q = loss_q
        if tol is not None and stall >= max(1, int(patience)):
            break  # plateau: this iteration's update is NOT applied
        if l2:
            grad = grad + l2 * w
        w = w - lr * grad
        b = b - lr * gb
    return {"weights": [float(t) for t in w], "bias": float(b),
            "losses": losses, "n": int(n)}


def planted_logreg(seed: int, dim: int) -> dict:
    """Seeded deterministic logreg model — Gaussian weights + bias (the
    ``planted_centroids``/``planted_projection`` convention): ONE
    generator shared by the Spark gate expression and the DuckDB oracle
    builder, so a driver row can value-check the gate DECISION machinery
    without the data-dependence of a real fit (trained weights pass
    through libm exp and cannot be cross-engine oracle literals — the
    documented reason ``fit_logreg_exact`` is unit-verified)."""
    rnd = random.Random(seed)
    return {"weights": [rnd.gauss(0.0, 0.5) for _ in range(dim)],
            "bias": rnd.gauss(0.0, 0.1), "losses": [], "n": 0}


def logreg_gate_fold(df: DataFrame, model: dict, threshold: float = 0.5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_scale: int = LOGREG_Q_SCALE) -> DataFrame:
    """The quality gate's DECISION surface as an exact fixed-point fold
    (r7 VERDICT item 4): ``(id, z_q, keep)`` where
    ``z_q = floor(b·Q) + Σ_i floor(x_i·w_i·Q)`` (each term one
    deterministic IEEE double product, floored — portable; the cross-term
    sum is BIGINT, associativity-free) and
    ``keep = z_q ≥ floor(logit(threshold)·Q)`` — the keep/drop rule
    ``σ(w·x+b) ≥ t  ⟺  w·x+b ≥ logit(t)`` with NO exp anywhere, so a
    serial SQL engine reproduces every bit with zero tolerance (the
    ``project_fold(q_scale=...)`` convention). Ties are INTEGER equality
    — identical in every engine, no ulp hazard at the boundary at all.

    This is the verification twin of the production gate
    (``score_logreg`` + a float threshold): the two decisions can differ
    only for rows within quantization distance (~dim/Q ≈ 6e-5) of the
    boundary — where the float gate itself is retraining-noise-unstable.
    NULL/wrong-length vectors gate NULL (the ``score_logreg`` NULL-score
    convention: no evidence is a policy decision downstream). Map-only —
    weights are expression literals, no shuffle, no Python."""
    w = model["weights"]
    dim = len(w)
    b_q = int(math.floor(float(model["bias"]) * q_scale))
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"logreg_gate_fold: threshold {threshold} must "
                         "be in (0, 1) — it is a probability")
    thr_q = int(math.floor(math.log(threshold / (1.0 - threshold))
                           * q_scale))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    wl = F.array(*[F.lit(float(x)) for x in w])
    qf = F.lit(float(q_scale))
    zq = F.aggregate(F.zip_with(v, wl, lambda a, c: F.floor(a * c * qf)),
                     F.lit(b_q).cast("long"), lambda acc, x: acc + x)
    malformed = (F.col(vec_col).isNull()
                 | (F.size(F.col(vec_col)) != F.lit(dim)))
    staged = df.select(F.col(id_col), malformed.alias("__mal"),
                       zq.alias("__zq"))
    return staged.select(
        F.col(id_col),
        F.when(F.col("__mal"), F.lit(None).cast("long"))
        .otherwise(F.col("__zq")).alias("z_q"),
        F.when(F.col("__mal"), F.lit(None).cast("boolean"))
        .otherwise(F.col("__zq") >= F.lit(thr_q)).alias("keep"))


def score_logreg(df: DataFrame, model: dict, vec_col: str = "embedding",
                 out_col: str = "quality_prob") -> DataFrame:
    """Map-only scoring: appends ``out_col`` = σ(w·x + b) — the
    probability the document is reference-like. NULL/wrong-length vectors
    score NULL (they carry no evidence; a downstream quality floor treats
    NULL as its own policy decision, same convention as quality_score).
    Embarrassingly parallel over a 100 TB scan — weights ride the closure,
    no shuffle, no collect."""
    w = np.asarray(model["weights"], dtype=np.float64)
    b = float(model["bias"])
    dim = w.shape[0]

    @F.pandas_udf("double")
    def prob(emb: pd.Series) -> pd.Series:
        out = np.full(len(emb), np.nan)
        ok = [i for i, v in enumerate(emb)
              if v is not None and len(v) == dim]
        if ok:
            x = np.vstack([np.asarray(emb.iloc[i], dtype=np.float64)
                           for i in ok])
            out[ok] = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        return pd.Series(out)

    return df.withColumn(out_col, prob(F.col(vec_col)))
