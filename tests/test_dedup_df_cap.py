"""Hot-shingle document-frequency cap (inverted-index pruning) in
ngram_jaccard_pairs: results must be unchanged when near-dup pairs share at
least one sub-cap shingle, while the candidate-join input provably shrinks.
This is the 100 TB skew guard — a corpus-wide boilerplate shingle would
otherwise contribute k² rows to the self-join.
"""

from __future__ import annotations

from data_engineering_etl_pipeline_spark.extensions.dedup import (
    _df_capped_index, ngram_jaccard_pairs, word_shingles)


BOILER = "terms of service apply here"  # 5 words → hot trigrams in every doc


def _corpus(spark, n_pairs: int = 8, n_singles: int = 10):
    """Docs = boilerplate prefix + distinctive body; even/odd ids form
    near-dup pairs (body differs by one trailing word), singles are unique."""
    rows = []
    for i in range(n_pairs):
        body = " ".join(f"w{i}_{j}" for j in range(10))
        rows.append((2 * i, f"{BOILER} {body} alpha"))
        rows.append((2 * i + 1, f"{BOILER} {body} beta"))
    for k in range(n_singles):
        body = " ".join(f"u{k}_{j}" for j in range(12))
        rows.append((1000 + k, f"{BOILER} {body}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capped_results_equal_uncapped(spark):
    docs = _corpus(spark)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.5, max_df=None)
    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_df=5)
    rows_u = sorted(map(tuple, uncapped.collect()))
    rows_c = sorted(map(tuple, capped.collect()))
    assert rows_u, "corpus must contain near-dup pairs"
    assert rows_c == rows_u  # identical pairs AND identical exact jaccards


def test_cap_shrinks_candidate_index(spark):
    docs = _corpus(spark)
    sh = word_shingles(docs)
    full = sh.count()
    capped = _df_capped_index(sh, "doc_id", max_df=5).count()
    # every doc carries the 3 boilerplate trigrams (DF = 26 > 5 each) →
    # exactly 3 * n_docs rows must drop out of the join input.
    n_docs = docs.count()
    assert capped == full - 3 * n_docs


def test_cap_drops_boilerplate_only_pairs(spark):
    # Two docs whose ONLY overlap is the hot boilerplate: uncapped finds
    # them below threshold anyway; capped never even considers them — the
    # documented trade-off, pinned so it's a choice, not an accident.
    docs = _corpus(spark, n_pairs=0, n_singles=6)
    capped = ngram_jaccard_pairs(docs, threshold=0.05, max_df=5)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.05, max_df=None)
    assert capped.count() == 0
    assert uncapped.count() > 0  # boilerplate overlap is visible uncapped
