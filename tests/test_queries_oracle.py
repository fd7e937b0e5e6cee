"""The local mirror of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB on the same parquet; oracle-less queries must
at least run and return a stable schema."""

from __future__ import annotations

import pytest

from data_engineering_etl_pipeline_spark.queries import ORACLES, QUERIES
from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        assert_matches_oracle(df, duck, ORACLES[name], name)
    else:
        n = df.count()
        assert n >= 0
        assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_region_revenue_library_query_matches_oracle(spark, duck):
    """region_revenue left the driver registry in r7 (slot consolidated
    into sql_nation_revenue's grouping-sets star) but remains library
    surface — its full value oracle moves here so the J1 stitch keeps a
    hash-checked twin."""
    from data_engineering_etl_pipeline_spark.queries.joins import (
        REGION_REVENUE_ORACLE, region_revenue)

    assert_matches_oracle(region_revenue(spark, SF_DIR), duck,
                          REGION_REVENUE_ORACLE, "region_revenue")


def test_event_time_windows_library_query_matches_oracle(spark, duck):
    """event_time_windows left the driver registry in r8 (headroom
    consolidation #3: tumbling/sliding ride user_sessions as grains) but
    remains library surface — its full value oracle moves here so both
    window families keep a hash-checked standalone twin."""
    from data_engineering_etl_pipeline_spark.queries.events import (
        EVENT_TIME_WINDOWS_ORACLE, event_time_windows)

    assert_matches_oracle(event_time_windows(spark, SF_DIR), duck,
                          EVENT_TIME_WINDOWS_ORACLE, "event_time_windows")


def test_doc_ngram_jaccard_library_query_matches_oracle(spark, duck):
    """doc_ngram_jaccard left the driver registry in r11 (headroom
    consolidation #4: its pair grain rides doc_minhash_lsh as the
    'ngram' stage) but remains library surface — its full value oracle
    moves here so the standalone builder keeps a hash-checked twin."""
    from data_engineering_etl_pipeline_spark.queries.text import (
        NGRAM_JACCARD_ORACLE, doc_ngram_jaccard)

    assert_matches_oracle(doc_ngram_jaccard(spark, SF_DIR), duck,
                          NGRAM_JACCARD_ORACLE, "doc_ngram_jaccard")


def test_doc_chunking_library_query_matches_oracle(spark, duck):
    """doc_chunking left the driver registry in r12 (headroom
    consolidation #5: its token-window grain rides pack_sequences as the
    'chunk' stage) but remains library surface — its full value oracle
    moves here so the standalone chunker keeps a hash-checked twin."""
    from data_engineering_etl_pipeline_spark.queries.corpusq import (
        DOC_CHUNKING_ORACLE, doc_chunking)

    assert_matches_oracle(doc_chunking(spark, SF_DIR), duck,
                          DOC_CHUNKING_ORACLE, "doc_chunking")


def test_corpus_split_profile_library_query_matches_oracle(spark, duck):
    """corpus_split_profile left the driver registry in r8 (headroom
    consolidation #1: it rides prep_training_corpus as the 'profile'
    stage grain) but remains library surface — its full value oracle
    moves here so the split+quantile construction keeps a hash-checked
    standalone twin."""
    from data_engineering_etl_pipeline_spark.queries.text import (
        CORPUS_SPLIT_PROFILE_ORACLE, corpus_split_profile)

    assert_matches_oracle(corpus_split_profile(spark, SF_DIR), duck,
                          CORPUS_SPLIT_PROFILE_ORACLE,
                          "corpus_split_profile")
