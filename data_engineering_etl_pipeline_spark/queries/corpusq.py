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


# BM25 SQL twin, consumed by the consolidated dsir_select row below (the
# standalone `bm25_scores` row was stage-tagged into it in r7 — headroom
# plan consolidation #2; the freed slot registered embedding_pca_moments).
# References a shared `base` CTE of (doc_id, lang, t).
_BM25_CTES = """
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
    ),
    bm25 AS (
      SELECT doc_id,
             ROUND(SUM(LN(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))),
                   6) AS bm25
      FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY doc_id
    )"""


# The standalone `lm_cross_entropy` row was folded into
# `ccnet_perplexity_mix` below (r4 registry curation under the 50-row
# cap): the mix row recomputes the identical add-k bigram LM per doc —
# scores, cutoffs, buckets, and the surviving sample are all
# hash-checked — and the FULL per-doc contract (including NULL xent on
# short docs) keeps its DuckDB hash-match unit in
# tests/test_corpus_ops.py::test_lm_cross_entropy_matches_duckdb.


# Shared LM-score CTE for the CCNet row (same model as lm_cross_entropy).
_LM_CTE = """
    WITH big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
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
    ),
    lw AS (
      SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             s.xent
      FROM documents d LEFT JOIN scored s USING (doc_id)
    )"""


#: fixed per-language token budgets for the ``mix`` grain — the
#: planted-constants convention: the libm-pow weight step stays
#: unit-verified (round-6 — the documented non-portable class), while
#: the integer fill DECISION under these budgets is hash-verified with
#: zero tolerance. es=0 proves a zero budget keeps nothing; zh is
#: deliberately ABSENT (absent key ⇒ budget 0 — the unallocated-source
#: contract); en/de/fr truncate at different depths at every SF.
_MIX_BUDGETS = {"en": 3000, "de": 800, "es": 0, "fr": 500}

#: whitespace-token mass of a doc, SQL form (NULL text → NULL → costs 0
#: in the fill; empty text → [''] → 1 in BOTH engines)
_WTOK_SQL = ("CASE WHEN text IS NULL THEN NULL ELSE "
             "len(string_split_regex(trim(text), '\\s+')) END")


def _ccnet_mix_oracle() -> str:
    from ..extensions.mixing import token_budget_sql

    fill = token_budget_sql("doc_id", "lang", _WTOK_SQL, _MIX_BUDGETS,
                            "ccnet-mix-v1")
    return _LM_CTE + """,
    cuts AS (SELECT quantile_cont(xent, [1.0/3.0, 2.0/3.0]) AS c FROM lw),
    bucketed AS (
      SELECT doc_id, n_bigrams, xent,
             CASE WHEN xent IS NULL THEN NULL
                  WHEN xent <= c[1] THEN 'head'
                  WHEN xent <= c[2] THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM lw CROSS JOIN cuts
    )
    SELECT 'ccnet' AS stage, doc_id, n_bigrams, xent, ppl_bucket,
           CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS BIGINT) AS mix_tokens,
           CAST(NULL AS BOOLEAN) AS kept
    FROM bucketed
    WHERE ppl_bucket IS NOT NULL
      AND """ + _MD5_32.format(
        arg="CAST(doc_id AS VARCHAR) || '|ccnet-v1'") + f"""
          < CASE ppl_bucket WHEN 'head' THEN 1.0 WHEN 'middle' THEN 0.5
                            ELSE 0.1 END * 4294967296
    UNION ALL
    SELECT 'mix' AS stage, id AS doc_id,
           CAST(NULL AS BIGINT) AS n_bigrams,
           CAST(NULL AS DOUBLE) AS xent,
           CAST(NULL AS VARCHAR) AS ppl_bucket,
           key AS lang, tokens AS mix_tokens, kept
    FROM ({fill})
    """


@register("ccnet_perplexity_mix", oracle=_ccnet_mix_oracle())
def ccnet_perplexity_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two corpus down-sampling DECISION surfaces in one stage-tagged row.

    ``ccnet``: CCNet-style perplexity bucketing + per-bucket
    downsampling (Wenzek et al. 2020 §4.3): score every doc with the
    corpus-trained bigram-LM cross-entropy, assign head/middle/tail
    terciles (one exact 1-row percentile agg), then keep head=100% /
    middle=50% / tail=10% via the deterministic md5 per-stratum sampler
    (extensions/corpus.py perplexity_buckets + stratified_sample — the
    r4 consolidation of the former standalone ``stratified_sample`` row
    into a strictly richer query: the oracle must reproduce the scores,
    the tercile cutoffs, the bucket assignment, AND the exact surviving
    sample bit-for-bit).

    ``mix`` (late r10): the temperature-mixture token-budget fill
    (extensions/mixing.py ``sample_to_token_budget``) over the
    documents table — per-language whitespace-token mass, FIXED planted
    budgets (``_MIX_BUDGETS``: truncating, zero, and absent languages
    all exercised), deterministic portable-hash-order inclusive prefix
    — every keep/drop decision hash-verified against the DuckDB
    ``token_budget_sql`` twin with zero tolerance. The ``n^alpha``
    weight/allocation steps stay unit-verified (libm pow — the
    ``quality_classifier_gate`` split applied to mixing: plant the
    non-portable constants, hash-verify the machinery they drive)."""
    from ..extensions.mixing import sample_to_token_budget

    docs = load_table(spark, sf_dir, "documents")
    b = (corpus.perplexity_buckets(docs)
         .filter(F.col("ppl_bucket").isNotNull()))
    nl, nd, ns = (F.lit(None).cast("long"), F.lit(None).cast("double"),
                  F.lit(None).cast("string"))
    cc = (corpus.stratified_sample(
        b, "ppl_bucket", {"head": 1.0, "middle": 0.5, "tail": 0.1},
        "doc_id", salt="ccnet-v1")
        .select(F.lit("ccnet").alias("stage"), "doc_id", "n_bigrams",
                "xent", "ppl_bucket", ns.alias("lang"),
                nl.alias("mix_tokens"),
                F.lit(None).cast("boolean").alias("kept")))
    wtok = (F.when(F.col("text").isNull(), F.lit(None).cast("long"))
            .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+"))
                       .cast("long")))
    mix = (sample_to_token_budget(
        docs.select("doc_id", "lang", wtok.alias("mix_tokens")),
        _MIX_BUDGETS, key_col="lang", token_col="mix_tokens",
        id_col="doc_id", salt="ccnet-mix-v1")
        .select(F.lit("mix").alias("stage"), "doc_id",
                nl.alias("n_bigrams"), nd.alias("xent"),
                ns.alias("ppl_bucket"), F.col("lang"), "mix_tokens",
                "kept"))
    return cc.unionByName(mix)


@register(
    "dsir_select",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS t
      FROM documents
    ),""" + _BM25_CTES + """, featarr AS (
      SELECT doc_id, lang,
             list_concat(t, list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i+1])) AS f
      FROM base
    ), rawf AS (
      SELECT doc_id, """ + _MD5_32.format(arg="g || '|dsir-v1'") + """
               % 512 AS b
      FROM (SELECT doc_id, unnest(f) AS g FROM featarr)
    ), tgtf AS (
      SELECT """ + _MD5_32.format(arg="g || '|dsir-v1'") + """ % 512 AS b
      FROM (SELECT unnest(f) AS g FROM featarr WHERE lang = 'en')
    ), rc AS (SELECT b, COUNT(*) AS cr FROM rawf GROUP BY 1),
    tc AS (SELECT b, COUNT(*) AS ct FROM tgtf GROUP BY 1),
    rn AS (SELECT SUM(cr) AS nr FROM rc),
    tn AS (SELECT SUM(ct) AS nt FROM tc),
    ratio AS (
      SELECT rc.b,
             LN((COALESCE(tc.ct, 0) + 1.0) / (tn.nt + 512.0))
             - LN((rc.cr + 1.0) / (rn.nr + 512.0)) AS lr
      FROM rc LEFT JOIN tc USING (b) CROSS JOIN rn CROSS JOIN tn
    ), lw AS (
      SELECT doc_id, ROUND(SUM(lr), 6) AS logw
      FROM rawf JOIN ratio USING (b) GROUP BY 1
    ), dsir AS (
      SELECT doc_id, logw,
             ROUND(logw + -(LN(-LN((""" + _MD5_32.format(
        arg="CAST(doc_id AS VARCHAR) || '|dsir-v1'") + """
               + 1) / 4294967297.0))), 6) AS dsir_score
      FROM lw ORDER BY dsir_score DESC, doc_id LIMIT 50
    )
    SELECT 'bm25' AS stage, doc_id, bm25,
           CAST(NULL AS DOUBLE) AS logw, CAST(NULL AS DOUBLE) AS dsir_score
    FROM bm25
    UNION ALL
    SELECT 'dsir' AS stage, doc_id, CAST(NULL AS DOUBLE) AS bm25,
           logw, dsir_score
    FROM dsir
    """,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two query/target-conditioned corpus scorers in one stage-tagged row
    (r7 consolidation of the former standalone ``bm25_scores`` row —
    headroom plan #2; the freed slot registered ``embedding_pca_moments``;
    both value surfaces stay fully hash-checked):

    ``bm25``: Okapi BM25 ranked retrieval for a fixed bag-of-words query
    (extensions/corpus.py bm25_scores; the exploded token stream is
    filtered to the query terms BEFORE any exchange, so shuffles carry
    the query's postings, not the corpus).

    ``dsir``: DSIR data selection (Xie et al. 2023): importance
    log-weights of every doc vs the English-documents target distribution
    over 512 hashed unigram+bigram buckets, then a deterministic
    Gumbel-top-50 sample ∝ exp(logw) (extensions/corpus.py dsir_topk —
    KB-scale broadcast count tables, map-only scoring, TakeOrdered
    ranking; the oracle reproduces weights, Gumbel noise, and the
    selected set bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    bm = (corpus.bm25_scores(docs, _QUERY_TERMS)
          .select(F.lit("bm25").alias("stage"), "doc_id", "bm25",
                  F.lit(None).cast("double").alias("logw"),
                  F.lit(None).cast("double").alias("dsir_score")))
    ds = (corpus.dsir_topk(docs, docs.filter(F.col("lang") == "en"),
                           k=50, buckets=512)
          .select(F.lit("dsir").alias("stage"), "doc_id",
                  F.lit(None).cast("double").alias("bm25"),
                  "logw", "dsir_score"))
    return bm.unionByName(ds)


#: doc_chunking's standalone construction (registry row r5–r11; retired to
#: the ``chunk`` grain of ``pack_sequences`` in r12 — headroom
#: consolidation #5, same token-window grain family). Kept verbatim as the
#: library twin's full value oracle (tests/test_queries_oracle.py), the
#: retired-row convention.
DOC_CHUNKING_ORACLE = """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents WHERE text IS NOT NULL),
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
    """


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
    ), ct AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
              FROM documents WHERE text IS NOT NULL),
    cs AS (
      SELECT doc_id, tk,
             (CASE WHEN len(tk) > 64 THEN len(tk) - 64 ELSE 0 END + 47) // 48
               AS kmax
      FROM ct
    )
    SELECT 'pack' AS stage, doc_id, n_tokens, shard,
           CAST(shard * 4294967296
           + (COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // 512) AS BIGINT) AS pack_id,
           CAST(NULL AS BIGINT) AS chunk_idx,
           CAST(NULL AS VARCHAR) AS chunk_text
    FROM toks
    UNION ALL
    SELECT 'chunk' AS stage, doc_id,
           CAST(least(64, len(tk) - (u.k * 48 + 1) + 1) AS BIGINT)
             AS n_tokens,
           CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS pack_id,
           CAST(u.k AS BIGINT) AS chunk_idx,
           array_to_string(tk[u.k * 48 + 1 : u.k * 48 + 64], ' ')
             AS chunk_text
    FROM cs, LATERAL (SELECT unnest(range(0, kmax + 1)) AS k) u
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window constructions over the documents table, two
    stage-tagged grains (r12 headroom consolidation #5):

    ``pack``: token-budget sequence packing into training packs —
    per-shard window cumsum, no global sort (extensions/corpus.py
    pack_sequences). Uses the portable md5 shard so the oracle reproduces
    the full shard → offset → pack assignment, not just the arithmetic.

    ``chunk``: the former ``doc_chunking`` row — overlapping token-window
    chunking (window 64, stride 48 → 16-token overlap), the long-document
    split that precedes packing (extensions/corpus.py chunk_documents).
    Map-only explode with bounded fan-out ⌈n_tok/stride⌉; every token
    lands in ≥1 chunk (coverage/overlap invariants unit-tested). The
    standalone builder keeps its full value oracle as a unit
    (``DOC_CHUNKING_ORACLE``, tests/test_queries_oracle.py)."""
    docs = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs, budget=512, n_shards=8,
                                   portable_shard=True)
    nl = F.lit(None).cast("long")
    pack_leg = packed.select(
        F.lit("pack").alias("stage"), "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"), "shard",
        "pack_id", nl.alias("chunk_idx"),
        F.lit(None).cast("string").alias("chunk_text"))
    chunk_leg = corpus.chunk_documents(docs, window=64, stride=48).select(
        F.lit("chunk").alias("stage"), "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        nl.alias("shard"), nl.alias("pack_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"), "chunk_text")
    return pack_leg.unionByName(chunk_leg)


#: planted per-language budgets for the corpus_schedule fills: en truncates
#: on DAY 1 (mass ≈ 5.7k at sf0.01 vs 4000), de keeps all of day 1 and
#: truncates mid-DAY-2 (1.6k then 2k vs 2500) — the cross-batch remaining-
#: budget decision provably bites in both directions; es=0 and zh-absent
#: re-pin the zero/unallocated contracts.
_SCHED_BUDGETS = {"en": 4000, "de": 2500, "es": 0, "fr": 700}
_SCHED_SALT = "sched-v1"


def _schedule_oracle() -> str:
    """DuckDB twin of the FULL corpus_schedule row: the epoch-reshuffle
    permutation over the packed table (pack_sequences' portable-md5
    shard/pack chain + epoch_plan's per-(epoch, shard) hash rank,
    inlined — both already proven standalone) and BOTH days of the
    continuous-ingest token-budget fill, where day 2's budgets are
    day 1's REMAINING budgets recomputed in SQL — the cross-batch state
    arithmetic itself is on the hash, not just each batch given a fixed
    dict. Exact integers end to end, zero tolerance."""
    hv_id = _MD5_32.format(arg="CAST(doc_id AS VARCHAR)")
    fill_hv = (f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
               f"'|{_SCHED_SALT}'), 1, 8) AS UBIGINT)")
    ep_hv = ("CAST('0x' || substr(md5(CAST(pack_id AS VARCHAR) || '|' || "
             "CAST(epoch AS VARCHAR) || '|' || 'epoch-v1'), 1, 8) "
             "AS UBIGINT)")
    vals = ", ".join(f"('{k}', {v})" for k, v in
                     sorted(_SCHED_BUDGETS.items()))
    cum = (f"SUM(tok) OVER (PARTITION BY lang ORDER BY {fill_hv} ASC, "
           "doc_id ASC ROWS UNBOUNDED PRECEDING)")
    return f"""
    WITH ptoks AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_tokens,
             CAST({hv_id} % 8 AS BIGINT) AS shard
      FROM documents
    ), packs AS (
      SELECT DISTINCT shard,
             CAST(shard * 4294967296
             + (COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 512) AS BIGINT) AS pack_id
      FROM ptoks
    ), fanned AS (
      SELECT pack_id, shard, unnest(range(0, 3)) AS epoch
      FROM packs WHERE pack_id IS NOT NULL
    ), ep AS (
      SELECT epoch, shard, pack_id,
             ROW_NUMBER() OVER (PARTITION BY epoch, shard
                                ORDER BY {ep_hv} ASC, pack_id ASC)
               AS epoch_order
      FROM fanned
    ), b(key, budget) AS (VALUES {vals}),
    d AS (
      SELECT doc_id, lang,
             GREATEST(CAST(COALESCE({_WTOK_SQL}, 0) AS BIGINT), 0) AS tok
      FROM documents WHERE doc_id IS NOT NULL
    ), f1 AS (
      SELECT c.doc_id, c.lang, c.tok,
             c.cum <= COALESCE(b.budget, 0) AS kept
      FROM (SELECT doc_id, lang, tok, {cum} AS cum
            FROM d WHERE doc_id % 2 = 0) c
      LEFT JOIN b ON c.lang IS NOT DISTINCT FROM b.key
    ), spent1 AS (
      SELECT lang, SUM(tok) AS s FROM f1 WHERE kept GROUP BY lang
    ), rem AS (
      SELECT b.key, GREATEST(b.budget - COALESCE(s.s, 0), 0) AS budget
      FROM b LEFT JOIN spent1 s ON b.key IS NOT DISTINCT FROM s.lang
    ), f2 AS (
      SELECT c.doc_id, c.lang, c.tok,
             c.cum <= COALESCE(r.budget, 0) AS kept
      FROM (SELECT doc_id, lang, tok, {cum} AS cum
            FROM d WHERE doc_id % 2 = 1) c
      LEFT JOIN rem r ON c.lang IS NOT DISTINCT FROM r.key
    ), state AS (
      SELECT lang, SUM(tok) AS consumed
      FROM (SELECT lang, tok FROM f1 WHERE kept
            UNION ALL SELECT lang, tok FROM f2 WHERE kept)
      GROUP BY lang
    )
    SELECT 'epoch' AS stage, CAST(epoch AS BIGINT) AS epoch, shard,
           pack_id, CAST(epoch_order AS BIGINT) AS epoch_order,
           CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS lang,
           CAST(NULL AS BIGINT) AS tokens, CAST(NULL AS BOOLEAN) AS kept,
           CAST(NULL AS BIGINT) AS consumed
    FROM ep
    UNION ALL
    SELECT 'fill1' AS stage, CAST(NULL AS BIGINT) AS epoch,
           CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS pack_id,
           CAST(NULL AS BIGINT) AS epoch_order, doc_id, lang,
           tok AS tokens, kept, CAST(NULL AS BIGINT) AS consumed
    FROM f1
    UNION ALL
    SELECT 'fill2' AS stage, CAST(NULL AS BIGINT) AS epoch,
           CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS pack_id,
           CAST(NULL AS BIGINT) AS epoch_order, doc_id, lang,
           tok AS tokens, kept, CAST(NULL AS BIGINT) AS consumed
    FROM f2
    UNION ALL
    SELECT 'state' AS stage, CAST(NULL AS BIGINT) AS epoch,
           CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS pack_id,
           CAST(NULL AS BIGINT) AS epoch_order,
           CAST(NULL AS BIGINT) AS doc_id, lang,
           CAST(NULL AS BIGINT) AS tokens, CAST(NULL AS BOOLEAN) AS kept,
           consumed
    FROM state
    """


@register("corpus_schedule", oracle=_schedule_oracle())
def corpus_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-ingest mixing/epoch surface ON the driver record
    (r10 VERDICT item 3; the slot came from headroom consolidation #4,
    ``doc_ngram_jaccard`` → ``doc_minhash_lsh``'s ``ngram`` grain) —
    four stage-tagged grains over the training-schedule family:

    ``epoch``: :func:`extensions.corpus.epoch_plan` over the SAME packed
    table as the ``pack_sequences`` row (portable-md5 shard) — the
    deterministic between-epoch reshuffle: every (epoch, shard) ranks
    its packs by the portable hash of ``pack_id|epoch|salt``. Bounded
    explode (3 epochs), shard-bounded rank — nothing sorts globally.

    ``fill1``/``fill2``/``state``: TWO chained batches of
    :func:`extensions.mixing.incremental_token_budget_fill` — day 1 =
    even doc_ids, day 2 = odd doc_ids filling each language's REMAINING
    budget under the planted ``_SCHED_BUDGETS`` (en truncates day 1, de
    truncates day 2, es=0, zh absent), plus the final consumed state.
    The oracle recomputes day 2's remaining budgets FROM day 1's kept
    mass in SQL, so the cross-batch state arithmetic — not just each
    batch under a handed-in dict — is hash-verified with zero
    tolerance (the ``doc_exact_dedup`` incr-leg convention applied to
    the mixture family)."""
    from ..extensions.mixing import incremental_token_budget_fill

    docs = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_sequences(docs, budget=512, n_shards=8,
                                   portable_shard=True)
    ep = corpus.epoch_plan(packed, n_epochs=3, salt="epoch-v1")
    nl, ns = F.lit(None).cast("long"), F.lit(None).cast("string")
    nb = F.lit(None).cast("boolean")
    ep_leg = ep.select(
        F.lit("epoch").alias("stage"), F.col("epoch").cast("long"),
        F.col("shard").cast("long"), F.col("pack_id").cast("long"),
        F.col("epoch_order").cast("long"), nl.alias("doc_id"),
        ns.alias("lang"), nl.alias("tokens"), nb.alias("kept"),
        nl.alias("consumed"))
    wtok = (F.when(F.col("text").isNull(), F.lit(None).cast("long"))
            .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+"))
                       .cast("long")))
    base = docs.select("doc_id", "lang", wtok.alias("tokens"))
    f1, s1 = incremental_token_budget_fill(
        base.filter(F.col("doc_id") % 2 == 0), None, _SCHED_BUDGETS,
        key_col="lang", token_col="tokens", id_col="doc_id",
        salt=_SCHED_SALT)
    f2, s2 = incremental_token_budget_fill(
        base.filter(F.col("doc_id") % 2 == 1), s1, _SCHED_BUDGETS,
        key_col="lang", token_col="tokens", id_col="doc_id",
        salt=_SCHED_SALT)

    def fill_leg(flags, tag):
        return flags.select(
            F.lit(tag).alias("stage"), nl.alias("epoch"),
            nl.alias("shard"), nl.alias("pack_id"),
            nl.alias("epoch_order"), F.col("doc_id"), F.col("lang"),
            F.col("tokens"), F.col("kept"), nl.alias("consumed"))

    state_leg = s2.select(
        F.lit("state").alias("stage"), nl.alias("epoch"), nl.alias("shard"),
        nl.alias("pack_id"), nl.alias("epoch_order"), nl.alias("doc_id"),
        F.col("lang"), nl.alias("tokens"), nb.alias("kept"),
        F.col("consumed").cast("long"))
    return (ep_leg.unionByName(fill_leg(f1, "fill1"))
            .unionByName(fill_leg(f2, "fill2")).unionByName(state_leg))


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


def _prep_oracle() -> str:
    """DuckDB twin of the ENTIRE prepare_training_corpus composition (new
    r6 — the registry's last rows-only non-connector row becomes fully
    value-checked). Each CTE is the proven construction from the stage's
    own registry oracle, chained: synthetic pages (doc_cleaning_suite's
    ``_C4_PAGE_SQL``) → C4 line clean + page gate → PII scrub
    (``scrub_pii_sql``) → exact dedup (min id per identical text — the SQL
    semantics the two-phase fingerprint plan must reproduce) →
    trigram-Jaccard pairs at max_df=50 (cold-shingle candidate join + the
    exact hot-overlap add-back, ``ngram_jaccard_pairs`` semantics) →
    recursive-CTE connected components (``doc_dedup_clusters``'s closure)
    → 13-gram decontamination (``doc_decontamination``'s shape, benchmark
    = raw pages of docs 3/17/42) → the rounded quality floor
    (``doc_text_stats``'s quality expression) → md5 content-hash split →
    per-shard cumsum packing (``pack_sequences``'s oracle)."""
    from ..extensions.cleaning import (C4_MIN_SENTENCES, C4_SENTENCE_RE,
                                       c4_kept_lines_sql)
    from ..extensions.pii import scrub_pii_sql
    from .text import _C4_PAGE_SQL

    cleaned = "array_to_string(" + c4_kept_lines_sql("text") + ", chr(10))"
    hv_text = _MD5_32.format(arg="text")
    hv_id = _MD5_32.format(arg="CAST(doc_id AS VARCHAR)")
    # the 'profile' stage grain (r8 headroom consolidation #1): the former
    # corpus_split_profile row's construction verbatim — raw documents,
    # salted content-hash 90/10 split, per-(split, lang) length quantiles
    hv_split = _MD5_32.format(arg="text || '|split-v1'")
    # doc_text_stats' quality expression (rounded — quality_score rounds to
    # 6 before prep's >= 0.05 floor compares)
    quality = (
        "ROUND(least(length(text) / 500.0, 1.0)"
        " * (1 - CASE WHEN length(regexp_replace(text, '\\s+', '', 'g')) > 0"
        " THEN CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))"
        " AS DOUBLE) / length(regexp_replace(text, '\\s+', '', 'g'))"
        " ELSE 0.0 END)"
        " * CASE WHEN len(t) > 0"
        " THEN CAST(len(list_filter(t, x -> regexp_matches(x, '^\\p{L}+$')))"
        " AS DOUBLE) / len(t) ELSE 0.0 END, 6)"
    )
    return f"""
    WITH RECURSIVE raw AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), pages AS (
      SELECT doc_id, {_C4_PAGE_SQL} AS text FROM raw
    ), doubled AS (
      SELECT doc_id, text FROM pages
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM pages WHERE doc_id % 11 = 1
    ), c4 AS (
      SELECT doc_id, {cleaned} AS ctext,
             contains(lower(text), 'lorem ipsum') AS has_lorem,
             (contains(text, '{{') OR contains(text, '}}')) AS has_brace
      FROM doubled
    ), scrubbed AS (
      SELECT doc_id, {scrub_pii_sql('ctext')} AS text
      FROM c4
      WHERE len(regexp_extract_all(ctext, '{C4_SENTENCE_RE}'))
              >= {C4_MIN_SENTENCES}
        AND NOT has_lorem AND NOT has_brace
    ), exact AS (
      SELECT doc_id, text FROM scrubbed
      QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
    ), toks AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t
      FROM exact
    ), sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(CASE WHEN len(t) >= 3 THEN range(1, len(t)-1)
                             ELSE [] END) AS u(i)
    ), dfreq AS (
      SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1
    ), cold AS (
      SELECT doc_id, shingle FROM sh JOIN dfreq USING (shingle) WHERE df <= 50
    ), hot AS (
      SELECT doc_id, shingle FROM sh JOIN dfreq USING (shingle) WHERE df > 50
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
    ), cpairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_cold
      FROM cold a JOIN cold b USING (shingle)
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2
    ), hov AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_hot
      FROM cpairs c
      JOIN hot a ON a.doc_id = c.id_a
      JOIN hot b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ), jpairs AS (
      SELECT id_a, id_b
      FROM cpairs LEFT JOIN hov USING (id_a, id_b)
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE (n_cold + COALESCE(n_hot, 0)) * 1.0
            / (sa.sz + sb.sz - n_cold - COALESCE(n_hot, 0)) >= 0.8
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM jpairs
      UNION
      SELECT id_b AS s, id_a AS d FROM jpairs
    ), reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ), drops AS (
      SELECT s AS doc_id FROM reach GROUP BY s HAVING s <> LEAST(s, MIN(d))
    ), bsh AS (
      SELECT DISTINCT array_to_string(bt[i:i+12], ' ') AS s
      FROM (SELECT string_split_regex(trim(text), '\\s+') AS bt
            FROM pages WHERE doc_id IN (3, 17, 42)),
           LATERAL (SELECT unnest(range(1, len(bt) - 11)) AS i)
    ), contam AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, array_to_string(t[i:i+12], ' ') AS s
            FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 11)) AS i)
            WHERE doc_id NOT IN (SELECT doc_id FROM drops)) d
      JOIN bsh USING (s)
    ), kept AS (
      SELECT doc_id, text, t FROM toks
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        AND doc_id NOT IN (SELECT doc_id FROM contam)
        AND {quality} >= 0.05
    ), labeled AS (
      SELECT doc_id,
             CASE WHEN {hv_text} < CAST(4294967296.0 * 0.9 AS DOUBLE)
                  THEN 'train' ELSE 'val' END AS split,
             CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_tokens
      FROM kept
    ), packs AS (
      SELECT doc_id, shard,
             CAST(shard * 4294967296
             + (COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 512) AS BIGINT) AS pack_id
      FROM (SELECT doc_id, n_tokens,
                   CAST({hv_id} % 8 AS BIGINT) AS shard
            FROM labeled WHERE split = 'train')
    )
    , sp_s AS (
      SELECT lang, length(text) AS n_chars,
             CASE WHEN {hv_split} % 100 < 90 THEN 'train' ELSE 'val' END
               AS split
      FROM documents
    )
    SELECT 'doc' AS stage, l.doc_id, l.split,
           CAST(l.n_tokens AS BIGINT) AS n_tokens, p.shard, p.pack_id,
           CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_docs,
           CAST(NULL AS DOUBLE) AS len_p25, CAST(NULL AS DOUBLE) AS len_p50,
           CAST(NULL AS DOUBLE) AS len_p75, CAST(NULL AS DOUBLE) AS len_p95
    FROM labeled l LEFT JOIN packs p USING (doc_id)
    UNION ALL
    SELECT 'profile' AS stage, CAST(NULL AS BIGINT) AS doc_id, split,
           CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS shard,
           CAST(NULL AS BIGINT) AS pack_id, lang,
           COUNT(*) AS n_docs,
           ROUND(quantile_cont(n_chars, 0.25), 4) AS len_p25,
           ROUND(quantile_cont(n_chars, 0.5), 4) AS len_p50,
           ROUND(quantile_cont(n_chars, 0.75), 4) AS len_p75,
           ROUND(quantile_cont(n_chars, 0.95), 4) AS len_p95
    FROM sp_s GROUP BY split, lang
    """


@register("prep_training_corpus", oracle=_prep_oracle())
def prep_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation (extensions/prep.py
    prepare_training_corpus), the flagship composition: C4 line clean →
    PII scrub → fingerprint-keyed exact dedup → trigram-Jaccard near-dup
    dedup → 13-gram benchmark decontamination → quality floor →
    content-hash train/val split → token-budget packing.

    Input: the deterministic multi-line synthetic pages (queries/text.py
    synthetic_page — the same construction the cleaning suite verifies
    per-rule), with every 11th-ish doc re-appended under a shifted id so
    exact dedup has planted work, and docs 3/17 as the benchmark so
    decontamination provably fires (each cleaned page keeps a 14-token
    line → a shared 13-gram with its own raw page; doc 42's page is
    C4-dropped first).

    FULL value oracle since r6 (previously rows-only): ``_prep_oracle``
    chains every stage's already-proven SQL construction end-to-end, so
    the driver hash-checks the composition itself — stage wiring bugs
    (wrong input relation, filter on the wrong side of a join) are now
    caught, not just per-stage math. ``portable_shard=True`` is the same
    oracle convention as the ``pack_sequences`` row (md5 shard instead of
    xxhash64, so DuckDB reproduces shard/pack_id bit-for-bit).
    max_df=50 on the near-dup index: the planted boilerplate lines appear
    in EVERY page, and the DF cap is exactly the guard that keeps
    corpus-wide shingles out of the pair self-join; the oracle reproduces
    the cap AND the exact hot-shingle overlap add-back.

    ``profile`` stage grain (r8 — headroom consolidation #1, the
    ``media_pipeline`` stage-tag pattern): the former
    ``corpus_split_profile`` row rides this row as a second grain — the
    salted content-hash 90/10 split of the RAW documents table profiled
    by exact per-(split, language) length quantiles. Both value surfaces
    stay hash-checked under one registry slot; the standalone builder
    keeps its own full oracle as a unit
    (queries/text.py::CORPUS_SPLIT_PROFILE_ORACLE)."""
    from ..extensions.prep import prepare_training_corpus
    from .text import corpus_split_profile, synthetic_page

    docs = load_table(spark, sf_dir, "documents")
    pages = docs.select("doc_id", synthetic_page().alias("text"))
    doubled = pages.unionByName(
        pages.filter(F.col("doc_id") % 11 == 1)
        .withColumn("doc_id", F.col("doc_id") + 1000000))
    bench = pages.filter(F.col("doc_id").isin([3, 17, 42])).select("text")
    out = prepare_training_corpus(
        doubled, bench, near_dup_threshold=0.8, near_dup_max_df=50,
        pack_budget=512, n_shards=8, portable_shard=True)
    nul = F.lit(None)
    doc_rows = out.select(
        F.lit("doc").alias("stage"), "doc_id", "split",
        F.col("n_tokens").cast("long").alias("n_tokens"), "shard",
        "pack_id", nul.cast("string").alias("lang"),
        nul.cast("long").alias("n_docs"),
        *[nul.cast("double").alias(c)
          for c in ("len_p25", "len_p50", "len_p75", "len_p95")])
    prof_rows = corpus_split_profile(spark, sf_dir).select(
        F.lit("profile").alias("stage"), nul.cast("long").alias("doc_id"),
        "split", nul.cast("long").alias("n_tokens"),
        nul.cast("long").alias("shard"), nul.cast("long").alias("pack_id"),
        "lang", "n_docs", "len_p25", "len_p50", "len_p75", "len_p95")
    return doc_rows.unionByName(prof_rows)


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48 → 16-token
    overlap) — the long-document split that precedes packing
    (extensions/corpus.py chunk_documents). Map-only explode with bounded
    fan-out ⌈n_tok/stride⌉; every token lands in ≥1 chunk (coverage/overlap
    invariants unit-tested). Registry row r5–r11; rides ``pack_sequences``
    as the ``chunk`` grain since r12 (headroom consolidation #5) — this
    standalone builder stays library surface with its full value oracle as
    a unit (``DOC_CHUNKING_ORACLE``, tests/test_queries_oracle.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus.chunk_documents(docs, window=64, stride=48)


_BPE_MERGES = 24
_BPE_MIN_FREQ = 2


def _bpe_merge_oracle() -> str:
    """DuckDB twin of the FULL BPE tokenizer-training decision surface
    (r11 VERDICT items 1b + 4): the learned merge SEQUENCE — argmax pair
    count per round, lexicographic ties, stop-when-nothing-repeats — as a
    bounded-rounds unrolled CTE chain (extensions/bpe.bpe_sql_ctes: merge
    = left-to-right non-overlapping string REPLACE over chr(31)-wrapped
    symbol strings), the ``min_freq`` distributed floor DECISION (the
    planted per-doc rare words flip the top merges if the floor fails —
    (q,z) would count once per doc), and the per-doc ENCODE counts under
    the learned merges, including sub-floor (unseen-in-training) words —
    rank-order merge application, provably the lowest-rank-pair loop."""
    from ..extensions.bpe import _SEP2, bpe_sql_ctes

    ctes, merges_select, vfinal = bpe_sql_ctes(
        _BPE_MERGES, min_freq=_BPE_MIN_FREQ, corpus_cte="bpe_corpus")
    return f"""
    WITH bpe_corpus AS MATERIALIZED (
      SELECT doc_id,
             concat_ws(' ', text,
                       'qz' || CAST(doc_id AS VARCHAR) || 'q') AS text
      FROM documents
    ),
    {ctes},
    bpe_docw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS word
        FROM bpe_corpus)
      WHERE word <> ''
    ),
    bpe_ns AS (
      SELECT word,
             CAST(len(string_split(s[2:len(s)-1], {_SEP2})) AS BIGINT)
               AS n_syms
      FROM {vfinal}
    ),
    bpe_enc AS (
      SELECT c.doc_id, COALESCE(SUM(ns.n_syms), 0) AS n_units
      FROM bpe_corpus c
      LEFT JOIN bpe_docw w ON w.doc_id = c.doc_id
      LEFT JOIN bpe_ns ns ON ns.word = w.word
      GROUP BY c.doc_id
    )
    SELECT 'merge' AS stage, merge_rank, left_sym, right_sym,
           CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_units
    FROM ({merges_select})
    UNION ALL
    SELECT 'encode' AS stage, CAST(NULL AS BIGINT) AS merge_rank,
           CAST(NULL AS VARCHAR) AS left_sym,
           CAST(NULL AS VARCHAR) AS right_sym, doc_id, n_units
    FROM bpe_enc
    """


@register("bpe_merge_sequence", oracle=_bpe_merge_oracle())
def bpe_merge_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning + encoding ON the driver record (r11 VERDICT
    items 1b and 4 — the last LLM-family decision surface that was
    unit-only; the slot came from headroom consolidation #5,
    ``doc_chunking`` → ``pack_sequences``'s ``chunk`` grain). Two
    stage-tagged grains over a corpus of the documents text plus ONE
    planted unique rare word per doc (``qz<doc_id>q`` — freq 1 each, so
    the shared (q, z) character pair would rank top-of-list if the
    ``min_freq`` floor ever failed to drop them):

    ``merge``: the learned merge sequence from
    :func:`extensions.bpe.train_bpe` at ``min_freq=2`` — the distributed
    frequency-floor prefilter (r11 item 1a, the SentencePiece/HF
    web-scale recipe) runs BEFORE the guarded vocabulary collect; the
    driver-side loop itself (deterministic: lexicographic ties, stop
    below count 2) is recomputed by the oracle's unrolled
    replace-per-round CTE chain, so the merge DECISION is on the hash.

    ``encode``: per-doc token counts under the learned merges
    (:func:`extensions.bpe.bpe_token_count`, the Arrow encode kernel) —
    the planted sub-floor words exercise the unseen-word segmentation
    path, the property BPE exists for, verified against the oracle's
    rank-order merge application.

    Scale shape: word_frequencies is the only corpus-sized stage (one
    map-side-combined exchange); the merge loop is codebook-sized by the
    floor; encoding is map-only Arrow batches."""
    from ..extensions.bpe import (bpe_token_count, train_bpe,
                                  word_frequencies)

    docs = load_table(spark, sf_dir, "documents")
    corp = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("text"),
            F.concat(F.lit("qz"), F.col("doc_id").cast("string"),
                     F.lit("q"))).alias("text"))
    merges = train_bpe(word_frequencies(corp), n_merges=_BPE_MERGES,
                       min_freq=_BPE_MIN_FREQ)
    nl, ns = F.lit(None).cast("long"), F.lit(None).cast("string")
    mdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank long, left_sym string, right_sym string").select(
        F.lit("merge").alias("stage"), "merge_rank", "left_sym",
        "right_sym", nl.alias("doc_id"), nl.alias("n_units"))
    enc = corp.select(
        F.lit("encode").alias("stage"), nl.alias("merge_rank"),
        ns.alias("left_sym"), ns.alias("right_sym"), "doc_id",
        bpe_token_count("text", merges).alias("n_units"))
    return mdf.unionByName(enc)


@register(
    "bpe_word_frequencies",
    oracle="""
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def bpe_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED surface of BPE tokenizer training on the driver
    record (r5 VERDICT item 8): `extensions/bpe.word_frequencies` — the
    only corpus-scale step of the trainer (explode → map-side partial agg
    → vocabulary-sized exchange). The driver-side merge loop is
    legitimately not SQL-expressible and stays unit-verified
    (tests/test_bpe.py: worked Sennrich example, partition invariance,
    row-budget guard); this row hash-checks the exact (word, freq) table
    that loop consumes, so the trainer's input contract is value-checked
    end-to-end."""
    from ..extensions.bpe import word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    return word_frequencies(docs, "text")
