"""Corpus-operator registry rows (§2.11 extension family, extensions/corpus.py):
BM25 ranked retrieval, bigram-LM quality scoring, stratified data mixing, and
token-budget sequence packing, each oracle-checked against DuckDB by the
driver (r3 VERDICT item 1: these ops previously had only unit-level oracles
because the registry sat at the 50-row cap; consolidation freed the slots).

The library implementations and their scale rationale live in
extensions/corpus.py; tests/test_corpus_ops.py keeps the unit-level oracle
twins plus bound/plan-purity checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions import corpus
from ..io import load_table
from . import register

_QUERY_TERMS = ["the", "data", "quality", "model"]

# DuckDB twin of the engine's portable 32-bit md5 prefix hash (no conv() in
# DuckDB → parse the 8 hex nibbles explicitly). {arg} is the hashed string
# expression.
_MD5_32 = """list_sum(list_transform(range(0, 8), i ->
        CAST(strpos('0123456789abcdef',
                    substr(md5({arg}), CAST(i + 1 AS INT), 1)) - 1
             AS BIGINT) << CAST((7 - i) * 4 AS INT)))"""


@register(
    "bm25_scores",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n, AVG(len(t)) AS avgdl FROM base
    ),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM base)
      WHERE term IN ('the', 'data', 'quality', 'model')
      GROUP BY 1, 2, 3
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    )
    SELECT doc_id,
           ROUND(SUM(LN(1 + (n - df + 0.5) / (df + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                 6) AS bm25
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval over the documents corpus for a fixed
    bag-of-words query (extensions/corpus.py bm25_scores; the exploded
    token stream is filtered to the query terms BEFORE any exchange, so
    shuffles carry the query's postings, not the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.bm25_scores(docs, _QUERY_TERMS)


@register(
    "lm_cross_entropy",
    oracle="""
    WITH big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents),
           LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w2) AS v FROM c2),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             ROUND(-AVG(LN((c2 + 0.1) / (c1 + 0.1 * v))), 6) AS xent
      FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           s.xent
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-k bigram LM trained on the
    corpus itself — the CCNet-style perplexity quality filter
    (extensions/corpus.py lm_cross_entropy; one bigram explode feeds the
    count tables and the scoring join)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.lm_cross_entropy(docs, "doc_id", "text", k=0.1)


@register(
    "stratified_sample",
    oracle="""
    SELECT * FROM documents
    WHERE """ + _MD5_32.format(
        arg="CAST(doc_id AS VARCHAR) || '|mix-v1'") + """
          < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 ELSE 0.0 END
            * 4294967296
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum subsample (data mixing) via an
    engine-portable md5 content hash — map-only, rerun/repartition-stable
    (extensions/corpus.py stratified_sample). The oracle reproduces the
    exact sample bit-for-bit from the same hash."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.stratified_sample(
        docs, "lang", {"en": 0.5, "de": 1.0}, "doc_id", salt="mix-v1")


@register(
    "pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_tokens,
             CAST(""" + _MD5_32.format(arg="CAST(doc_id AS VARCHAR)") + """
               % 8 AS BIGINT) AS shard
      FROM documents
    )
    SELECT doc_id, n_tokens, shard,
           CAST(shard * 4294967296
           + (COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // 512) AS BIGINT) AS pack_id
    FROM toks
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing into training packs: per-shard window
    cumsum, no global sort (extensions/corpus.py pack_sequences). Uses the
    portable md5 shard so the oracle reproduces the full shard → offset →
    pack assignment, not just the arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs, budget=512, n_shards=8,
                                   portable_shard=True)
    return packed.withColumn("n_tokens", F.col("n_tokens").cast("long"))


@register(
    "doc_decontamination",
    oracle="""
    WITH bench AS (SELECT text FROM documents WHERE doc_id IN (3, 17, 42)),
    bsh AS (
      SELECT DISTINCT array_to_string(t[i:i+12], ' ') AS s
      FROM (SELECT string_split_regex(trim(text), '\\s+') AS t FROM bench),
           LATERAL (SELECT unnest(range(1, len(t) - 11)) AS i)
    ),
    dsh AS (
      SELECT doc_id, array_to_string(t[i:i+12], ' ') AS s
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents),
           LATERAL (SELECT unnest(range(1, len(t) - 11)) AS i)
    ),
    hits AS (SELECT DISTINCT doc_id FROM dsh JOIN bsh USING (s))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag every corpus doc sharing a word
    13-gram with a benchmark set (here: three corpus docs stand in for the
    benchmark, so the flag provably fires). The GPT-3-appendix-C /
    Llama-report n-gram-collision recipe (extensions/corpus.py
    flag_contaminated): benchmark shingles broadcast, the corpus side is a
    map-only explode + broadcast LEFT SEMI — the 100 TB corpus never
    shuffles (plan pinned in tests/test_corpus_ops.py)."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id").isin([3, 17, 42])).select("text")
    return corpus.flag_contaminated(docs, bench, n=13)


@register(
    "doc_chunking",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
    s AS (
      SELECT doc_id, tk,
             (CASE WHEN len(tk) > 64 THEN len(tk) - 64 ELSE 0 END + 47) // 48
               AS kmax
      FROM t
    )
    SELECT doc_id, CAST(u.k AS INT) AS chunk_idx,
           CAST(least(64, len(tk) - (u.k * 48 + 1) + 1) AS INT) AS n_tokens,
           array_to_string(tk[u.k * 48 + 1 : u.k * 48 + 64], ' ') AS chunk_text
    FROM s, LATERAL (SELECT unnest(range(0, kmax + 1)) AS k) u
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48 → 16-token
    overlap) — the long-document split that precedes packing
    (extensions/corpus.py chunk_documents). Map-only explode with bounded
    fan-out ⌈n_tok/stride⌉; every token lands in ≥1 chunk (coverage/overlap
    invariants unit-tested)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.chunk_documents(docs, window=64, stride=48)
