"""Distributed logistic-regression quality classifier
(extensions/classifier.py): exact fixed-point gradient accumulation.

Pins: byte-stable fits under relayout; bit-equality with a driver-side
numpy twin of the identical quantize→sum→update convention; learning on a
planted separable fixture (loss strictly decreases, perfect accuracy);
NULL/wrong-length handling; end-to-end composition with the hashed TF-IDF
vectorizer (the curated-vs-raw quality-filter recipe).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.extensions.classifier import (
    LOGREG_Q_SCALE, fit_logreg_exact, score_logreg)

DIM = 8


def _blobs_df(spark, n_per=60, gap=2.0, seed=3):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_per):
        rows.append((i, [float(x) for x in rng.normal(-gap / 2, 0.5, DIM)],
                     0))
        rows.append((n_per + i,
                     [float(x) for x in rng.normal(gap / 2, 0.5, DIM)], 1))
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, label int")


def test_learns_separable_blobs_and_loss_decreases(spark):
    df = _blobs_df(spark)
    model = fit_logreg_exact(df, dim=DIM, n_iters=15, lr=1.0)
    losses = model["losses"]
    assert all(losses[i] > losses[i + 1] for i in range(len(losses) - 1)), \
        losses
    scored = score_logreg(df, model)
    acc = scored.filter(
        (F.col("quality_prob") >= 0.5) == (F.col("label") == 1)
    ).count() / df.count()
    assert acc == 1.0


def test_fit_is_byte_stable_under_relayout(spark):
    df = _blobs_df(spark)
    a = fit_logreg_exact(df.repartition(13), dim=DIM, n_iters=5)
    b = fit_logreg_exact(df.coalesce(1), dim=DIM, n_iters=5)
    c = fit_logreg_exact(df.repartition(3, F.rand(7)), dim=DIM, n_iters=5)
    assert a == b == c  # weights, bias, losses: byte equality


def test_fit_matches_driver_numpy_twin(spark):
    df = _blobs_df(spark)
    model = fit_logreg_exact(df, dim=DIM, n_iters=7, lr=0.5)

    rows = df.select("embedding", "label").collect()
    x = np.vstack([np.asarray(list(r["embedding"]), dtype=np.float64)
                   for r in rows])
    y = np.asarray([float(r["label"]) for r in rows])
    q = float(LOGREG_Q_SCALE)
    n = len(x)
    w = np.zeros(DIM)
    b = 0.0
    for _ in range(7):
        r = 1.0 / (1.0 + np.exp(-(x @ w + b))) - y
        gw = np.floor((x * r[:, None]) * q).sum(axis=0) / (n * q)
        gb = np.floor(r * q).sum() / (n * q)
        w = w - 0.5 * gw
        b = b - 0.5 * gb
    assert model["weights"] == [float(t) for t in w]
    assert model["bias"] == float(b)


def test_null_and_wrong_length_rows_excluded_from_fit_null_scores(spark):
    df = _blobs_df(spark, n_per=20)
    extra = spark.createDataFrame(
        [(10 ** 6, None, 1), (10 ** 6 + 1, [1.0], 0),
         (10 ** 6 + 2, [0.5] * DIM, None)],
        "id long, embedding array<float>, label int")
    clean = fit_logreg_exact(df, dim=DIM, n_iters=3)
    dirty = fit_logreg_exact(df.unionByName(extra), dim=DIM, n_iters=3)
    assert clean == dirty  # degenerate rows contribute nothing
    scored = {r["id"]: r["quality_prob"]
              for r in score_logreg(extra, clean).collect()}
    assert scored[10 ** 6] is None and scored[10 ** 6 + 1] is None
    assert scored[10 ** 6 + 2] is not None


def test_quality_filter_composes_with_tfidf_vectorizer(spark):
    """The full curated-vs-raw recipe: texts with the curated marker
    vocabulary vs noise texts → hashed TF-IDF → fit → the classifier
    separates held-out texts of both kinds."""
    from data_engineering_etl_pipeline_spark.extensions.corpus import (
        fit_tfidf_idf, hashed_tfidf_vectors)

    cur = [f"curated {w} prose with careful structure and citations"
           for w in ("alpha", "beta", "gamma", "delta", "epsilon",
                     "zeta", "eta", "theta")]
    raw = [f"buy now {w} click here spam spam free offer"
           for w in ("one", "two", "three", "four", "five", "six",
                     "seven", "eight")]
    rows = ([(i, t, 1) for i, t in enumerate(cur)]
            + [(100 + i, t, 0) for i, t in enumerate(raw)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    idf = fit_tfidf_idf(docs, dim=32)  # FROZEN: train and apply must share it
    vecs = hashed_tfidf_vectors(docs, dim=32, idf=idf).join(
        docs.select("doc_id", "label"), "doc_id")
    model = fit_logreg_exact(vecs, dim=32, n_iters=25, lr=2.0)
    held = spark.createDataFrame(
        [(0, "curated gamma prose with citations"),
         (1, "click here free spam offer")], "doc_id long, text string")
    hv = hashed_tfidf_vectors(held, dim=32, idf=idf)
    got = {r["doc_id"]: r["quality_prob"]
           for r in score_logreg(hv, model).collect()}
    assert got[0] > 0.5 > got[1], got


def test_prep_pipeline_with_learned_quality_gate(spark):
    """prepare_training_corpus(quality_clf=...) applies the learned filter
    as stage 6b: planted spam docs (which pass the heuristic floor) are
    dropped, curated docs survive every stage, and the default path
    (quality_clf=None) keeps both — proving the stage is additive."""
    from data_engineering_etl_pipeline_spark.extensions.corpus import (
        fit_tfidf_idf, hashed_tfidf_vectors)
    from data_engineering_etl_pipeline_spark.extensions.prep import (
        prepare_training_corpus)

    # three sentences per doc (the C4 page floor), every line >= 5 words
    cur = [f"The curated {w} corpus reads like careful prose. "
           f"Each {w} section cites sources and explains context fully. "
           "Structure and complete sentences appear throughout the text."
           for w in ("alpha", "beta", "gamma", "delta", "epsilon",
                     "zeta", "eta", "theta")]
    raw = [f"Buy now {w} click here for spam offers. "
           f"Win big {w} prizes now with this limited deal. "
           "Click the spam link to claim free offers."
           for w in ("one", "two", "three", "four", "five", "six",
                     "seven", "eight")]
    rows = ([(i, t, 1) for i, t in enumerate(cur)]
            + [(100 + i, t, 0) for i, t in enumerate(raw)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    idf = fit_tfidf_idf(docs, dim=32)
    vecs = hashed_tfidf_vectors(docs, dim=32, idf=idf).join(
        docs.select("doc_id", "label"), "doc_id")
    from data_engineering_etl_pipeline_spark.extensions.classifier import (
        fit_logreg_exact)
    model = fit_logreg_exact(vecs, dim=32, n_iters=25, lr=2.0)

    corpus = docs.select("doc_id", "text")
    base_ids = {r["doc_id"] for r in
                prepare_training_corpus(corpus, min_quality=0.0)
                .select("doc_id").collect()}
    assert base_ids >= {0, 100}, base_ids  # both kinds pass the heuristics

    clf = {"model": model, "idf": idf, "dim": 32, "threshold": 0.5}
    got_ids = {r["doc_id"] for r in
               prepare_training_corpus(corpus, min_quality=0.0,
                                       quality_clf=clf)
               .select("doc_id").collect()}
    assert all(i < 100 for i in got_ids), got_ids   # every spam doc dropped
    assert got_ids, "curated docs must survive"
    assert got_ids <= base_ids


def test_resume_equals_uninterrupted_fit(spark):
    """Kill-and-resume determinism: 3 iterations then 4 more from the
    recorded weights == 7 straight — byte equality (the whole loop state
    is the KB-scale model; every step is exact-deterministic)."""
    df = _blobs_df(spark)
    straight = fit_logreg_exact(df, dim=DIM, n_iters=7, lr=0.5)
    part = fit_logreg_exact(df, dim=DIM, n_iters=3, lr=0.5)
    resumed = fit_logreg_exact(df, dim=DIM, n_iters=4, lr=0.5,
                               init_weights=part["weights"],
                               init_bias=part["bias"])
    assert resumed["weights"] == straight["weights"]
    assert resumed["bias"] == straight["bias"]
    assert part["losses"] + resumed["losses"] == straight["losses"]


def test_quality_clf_dim_mismatch_refused(spark):
    """r7 review finding: a model/dim mismatch would NULL-score and
    silently drop the whole corpus — must refuse loudly instead."""
    import pytest

    from data_engineering_etl_pipeline_spark.extensions.prep import (
        prepare_training_corpus)

    docs = spark.createDataFrame([(0, "text")], "doc_id long, text string")
    model = {"weights": [0.0] * 32, "bias": 0.0}
    with pytest.raises(ValueError, match="32 weights but dim=64"):
        prepare_training_corpus(
            docs, quality_clf={"model": model, "idf": [1.0] * 64,
                               "dim": 64})


def test_init_weights_bad_shapes_raise_value_error(spark):
    import pytest

    df = _blobs_df(spark, n_per=5)
    for bad in (0.5, [[0.0] * DIM]):
        with pytest.raises(ValueError, match="init_weights shape"):
            fit_logreg_exact(df, dim=DIM, n_iters=1, init_weights=bad)


def test_early_stop_equals_truncated_full_run(spark):
    """r7 VERDICT item 5: with tol set, the fit stops once the INTEGER
    loss sum stops improving by tol — and the returned model is byte-
    equal to a full run truncated at the last applied update (the stop
    check never applies a partial step). The planted separable fixture
    must actually stop before n_iters for a coarse tol."""
    df = _blobs_df(spark)
    stopped = fit_logreg_exact(df, dim=DIM, n_iters=40, lr=1.0, tol=0.01)
    k = len(stopped["losses"])
    assert k < 40, "planted fixture should plateau well before 40 scans"
    # k iterations ran; the k-th recorded the loss and then broke without
    # updating, so k-1 updates were applied
    full = fit_logreg_exact(df, dim=DIM, n_iters=k - 1, lr=1.0)
    assert stopped["weights"] == full["weights"]
    assert stopped["bias"] == full["bias"]
    assert stopped["losses"][:k - 1] == full["losses"]


def test_dot_mode_fold_learns_and_is_relayout_stable(spark):
    """The fixed-order per-row dot hatch (r7 advisor finding): same
    learning behavior, byte-stable across relayouts by CONSTRUCTION (the
    gemv default is batch-shape-invariant in practice only)."""
    df = _blobs_df(spark)
    a = fit_logreg_exact(df.repartition(11), dim=DIM, n_iters=5,
                         dot_mode="fold")
    b = fit_logreg_exact(df.coalesce(1), dim=DIM, n_iters=5,
                         dot_mode="fold")
    assert a == b
    assert a["losses"] == sorted(a["losses"], reverse=True)
    import pytest
    with pytest.raises(ValueError, match="dot_mode"):
        fit_logreg_exact(df, dim=DIM, n_iters=1, dot_mode="blas")


def test_gate_fold_matches_float_gate_away_from_boundary(spark):
    """logreg_gate_fold (the oracle-able DECISION surface): agrees with
    the float gate sigma(z) >= t wherever |z - logit(t)| exceeds the
    quantization error bound dim/Q, and gates NULL on malformed rows."""
    import math

    from data_engineering_etl_pipeline_spark.extensions.classifier import (
        logreg_gate_fold, planted_logreg)

    df = _blobs_df(spark, n_per=40)
    model = planted_logreg(909, DIM)
    t = 0.62
    gate = {r["id"]: (r["z_q"], r["keep"])
            for r in logreg_gate_fold(df, model, threshold=t, id_col="id",
                                      vec_col="embedding").collect()}
    w = np.asarray(model["weights"])
    bias = float(model["bias"])
    logit = math.log(t / (1.0 - t))
    bound = (DIM + 1) / float(LOGREG_Q_SCALE)
    checked = 0
    for r in df.select("id", "embedding").collect():
        z = float(np.asarray(list(r["embedding"])) @ w + bias)
        if abs(z - logit) > bound:
            assert gate[r["id"]][1] == (z >= logit), (r["id"], z)
            checked += 1
    assert checked >= 70  # the fixture is nowhere near the boundary

    mal = spark.createDataFrame([(1, None), (2, [1.0])],
                                "id long, embedding array<float>")
    out = {r["id"]: (r["z_q"], r["keep"])
           for r in logreg_gate_fold(mal, model, threshold=t, id_col="id",
                                     vec_col="embedding").collect()}
    assert out == {1: (None, None), 2: (None, None)}

    import pytest
    with pytest.raises(ValueError, match="threshold"):
        logreg_gate_fold(df, model, threshold=1.5, id_col="id")
