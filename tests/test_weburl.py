"""URL/domain curation family (extensions/weburl.py): canonicalization,
registered-domain extraction, URL-keyed exact dedup, per-domain caps,
blocklist filtering — every construction value-checked against a DuckDB
twin built from the SAME pattern constants (the family lives outside the
50-row driver registry, so the full hash units live here — the
corpus_split_profile/region_revenue library-oracle convention).

The fixture URL is synthesized deterministically from the documents table
(doc_id arithmetic) in BOTH engines, exercising every rule: scheme case,
``www.``, default/explicit ports, tracking params, param order, fragments,
trailing slashes, co.uk-class registered domains, schemeless strings,
NULLs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.extensions.sampling import (  # noqa: E402
    quota_rank_sql)
from data_engineering_etl_pipeline_spark.extensions.weburl import (
    canonicalize_url, canonicalize_url_sql, domain_balanced_sample,
    filter_blocklisted, host_sql, registered_domain,
    registered_domain_from_host_sql, url_dedup_keep_first)
from data_engineering_etl_pipeline_spark.io import load_table

from .conftest import SF_DIR, assert_matches_oracle

# The deterministic URL zoo is shared with the doc_url_curation driver
# row (queries/text.py synthetic_url / SYNTHETIC_URL_SQL) — one
# construction, one SQL twin, used by both the registry oracle and the
# library units here.
from data_engineering_etl_pipeline_spark.queries.text import (  # noqa: E402
    SYNTHETIC_URL_SQL as _SYNTH_URL_SQL, synthetic_url as _synth_url_spark)


def _docs_urls(spark):
    return (load_table(spark, SF_DIR, "documents")
            .select("doc_id", _synth_url_spark().alias("url")))


def test_canonicalize_url_matches_duckdb_twin(spark, duck):
    got = _docs_urls(spark).select(
        "doc_id", canonicalize_url("url").alias("canonical_url"))
    sql = f"""
    WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents)
    SELECT doc_id, {canonicalize_url_sql('url')} AS canonical_url FROM u
    """
    assert_matches_oracle(got, duck, sql, "canonicalize_url")


def test_canonicalize_url_point_cases(spark):
    rows = [
        (1, "HTTPS://WWW.Ex.COM:443/a/?utm_source=s&b=2&a=1#frag"),
        (2, "http://ex.com:80"),
        (3, "http://ex.com:8080/x"),   # non-default port survives
        (4, "no-scheme.com/x?utm_source=s"),  # opaque: returned trimmed
        (5, None),
        (6, "  https://ex.com/x  "),   # trimmed
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r["c"] for r in df.select(
        "id", canonicalize_url("url").alias("c")).collect()}
    assert out[1] == "https://ex.com/a?a=1&b=2"
    assert out[2] == "http://ex.com"
    assert out[3] == "http://ex.com:8080/x"
    assert out[4] == "no-scheme.com/x?utm_source=s"
    assert out[5] is None
    assert out[6] == "https://ex.com/x"


def test_registered_domain_matches_duckdb_twin(spark, duck):
    got = _docs_urls(spark).select(
        "doc_id", registered_domain("url").alias("domain"))
    h = host_sql("url")
    sql = f"""
    WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
    hh AS (SELECT doc_id, {h} AS h FROM u)
    SELECT doc_id, {registered_domain_from_host_sql('h')} AS domain FROM hh
    """
    assert_matches_oracle(got, duck, sql, "registered_domain")


def test_registered_domain_point_cases(spark):
    rows = [(1, "https://a.b.example.com/x"), (2, "https://sub.shop.co.uk/"),
            (3, "https://localhost/x"), (4, "plain-string"),
            (5, "https://x.ac.jp/y"), (6, "https://a.co/x")]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r["d"] for r in df.select(
        "id", registered_domain("url").alias("d")).collect()}
    assert out[1] == "example.com"
    assert out[2] == "shop.co.uk"   # co.uk class keeps three labels
    assert out[3] == "localhost"
    assert out[4] == ""             # no scheme -> no host
    assert out[5] == "x.ac.jp"
    assert out[6] == "a.co"


def test_url_dedup_keep_first_matches_duckdb_twin(spark, duck):
    """Shapes 1/2/3 canonicalize to shape 0's URL and shape 5 to shape
    4's — the min-doc_id copy per canonical URL must be the keeper; NULL
    URLs are all kept."""
    got = url_dedup_keep_first(_docs_urls(spark))
    canon = canonicalize_url_sql("url")
    sql = f"""
    WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
    c AS (SELECT doc_id, {canon} AS canonical_url FROM u)
    SELECT doc_id, canonical_url,
           canonical_url IS NULL
           OR doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) AS kept
    FROM c
    """
    assert_matches_oracle(got, duck, sql, "url_dedup_keep_first")
    # planted structure sanity: at least one real dup group was dropped
    dropped = got.filter(~F.col("kept")).count()
    assert dropped > 0


def test_domain_balanced_sample_caps_and_is_deterministic(spark, duck):
    """Quota flags at most Q per registered domain, selected by the
    portable hash — the DuckDB single-window twin must agree row-for-row
    (the generic two-phase machinery is value-equal to the naive global
    rank, the cluster_balanced_sample subset-property argument)."""
    q = 3
    got = domain_balanced_sample(_docs_urls(spark), q, seed=7)
    h = host_sql("url")
    sql = f"""
    WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
    hh AS (SELECT doc_id, {h} AS h FROM u),
    d AS (SELECT doc_id, {registered_domain_from_host_sql('h')} AS domain
          FROM hh),
    r AS (
      SELECT doc_id, domain,
             {quota_rank_sql('doc_id', 'domain', 'domain-balance-7')} AS rn
      FROM d)
    SELECT doc_id, domain, rn <= {q} AS kept FROM r
    """
    assert_matches_oracle(got, duck, sql, "domain_balanced_sample")
    kept_per = (got.filter("kept").groupBy("domain").count().collect())
    assert kept_per and all(r["count"] <= q for r in kept_per)


def test_filter_blocklisted_drops_whole_registered_domain(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.evil.co.uk/x"), (2, "https://evil.co.uk/y"),
         (3, "https://good.com/z"), (4, "https://EVIL.com/q")],
        "doc_id long, url string")
    bl = spark.createDataFrame([("evil.co.uk",), ("Evil.com",)],
                               "domain string")
    kept = {r["doc_id"] for r in filter_blocklisted(docs, bl).collect()}
    assert kept == {3}


def test_domain_sample_plan_is_two_phase(spark):
    """The generic machinery keeps the plan contract on a string key: the
    ranking window consumes the mapInPandas prune, not the corpus."""
    import contextlib
    import io

    df = domain_balanced_sample(_docs_urls(spark), 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    iw = p.index("Window")
    im = p.index("MapInPandas")
    assert iw < im, p
    seg = p[iw:im]
    assert "Scan parquet" not in seg and "InMemoryTableScan" not in seg, seg


def test_fragment_with_question_mark_is_not_resurrected(spark, duck):
    """r8 review finding: an unanchored query regex matched a '?' INSIDE
    the fragment, resurrecting fragment content as the query — two URLs
    identical up to fragment must canonicalize identically (both
    engines: shared constant)."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        canonicalize_url_sql)

    rows = [(1, "https://ex.com/a#x?b=1"), (2, "https://ex.com/a"),
            (3, "https://ex.com/a?b=1#x?c=2")]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r["c"] for r in df.select(
        "id", canonicalize_url("url").alias("c")).collect()}
    assert out[1] == "https://ex.com/a" == out[2]
    assert out[3] == "https://ex.com/a?b=1"
    got = df.select("id", canonicalize_url("url").alias("c"))
    sql = ("SELECT * FROM (VALUES (1, " + canonicalize_url_sql(
        "'https://ex.com/a#x?b=1'") + "), (2, " + canonicalize_url_sql(
        "'https://ex.com/a'") + "), (3, " + canonicalize_url_sql(
        "'https://ex.com/a?b=1#x?c=2'") + ")) AS t(id, c)")
    assert_matches_oracle(got, duck, sql, "fragment_query_anchor")


def test_blocklist_full_host_entries_block_registered_domain(spark):
    """r8 review finding: real blocklists carry full hosts — a
    'www.evil.com' or 'bad.evil.com' entry must block the evil.com
    registered domain, not be silently inert."""
    docs = spark.createDataFrame(
        [(1, "https://evil.com/x"), (2, "https://sub.evil.com/y"),
         (3, "https://good.com/z"), (4, "https://nasty.co.uk/q")],
        "doc_id long, url string")
    bl = spark.createDataFrame(
        [("www.evil.com",), ("bad.NASTY.co.uk ",)], "domain string")
    kept = {r["doc_id"] for r in filter_blocklisted(docs, bl).collect()}
    assert kept == {3}


def test_canonicalize_is_idempotent_on_the_url_zoo(spark):
    """Canonical form is a fixed point: re-canonicalizing stored canonical
    URLs (the incremental-pipeline replay case) changes nothing —
    including multi-slash tails, which a single-slash strip would reduce
    one character per pass."""
    extra = spark.createDataFrame(
        [(10 ** 9, "https://ex.com/x//"), (10 ** 9 + 1, "https://ex.com///")],
        "doc_id long, url string")
    df = _docs_urls(spark).unionByName(extra)
    once = df.select("doc_id", canonicalize_url("url").alias("url"))
    twice = once.select("doc_id", canonicalize_url("url").alias("url"))
    a = {r["doc_id"]: r["url"] for r in once.collect()}
    b = {r["doc_id"]: r["url"] for r in twice.collect()}
    assert a == b
    assert a[10 ** 9] == "https://ex.com/x"


def test_psl_registered_domain_point_cases(spark):
    """r8 VERDICT item 4: the PSL-backed registered domain — longest
    listed suffix + one label, private suffixes (github.io-class)
    honored, a host that IS a suffix has no registrable part, unlisted
    TLDs fall back to the implicit '*' rule, NULL/'' preserved."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        with_registered_domain_psl)

    sfx = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("io",), ("github.io",)],
        "suffix string")
    rows = [
        (1, "https://a.b.example.co.uk/x"),   # co.uk -> example.co.uk
        (2, "https://www.example.com/x"),     # com -> example.com
        (3, "https://alice.github.io/blog"),  # private -> alice.github.io
        (4, "https://deep.sub.alice.github.io"),  # still alice.github.io
        (5, "https://github.io"),             # host IS a suffix -> ''
        (6, "https://example.weirdtld/x"),    # implicit * fallback
        (7, "https://weirdtld"),              # 1-label unlisted -> ''
        (8, None),                            # NULL -> NULL
        (9, "not a url"),                     # no host -> ''
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r["domain"] for r in
           with_registered_domain_psl(df, sfx).collect()}
    assert got == {1: "example.co.uk", 2: "example.com",
                   3: "alice.github.io", 4: "alice.github.io",
                   5: "", 6: "example.weirdtld", 7: "", 8: None, 9: ""}


def test_psl_plan_is_map_only_broadcast_joins(spark):
    """The PSL match is K broadcast left joins sliced from the host
    labels — ZERO corpus shuffles (an explode + groupBy longest-match
    would re-shuffle the corpus by id)."""
    import contextlib
    import io

    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        with_registered_domain_psl)

    docs = _docs_urls(spark)
    sfx = spark.createDataFrame([("com",), ("co.uk",)], "suffix string")
    out = with_registered_domain_psl(docs, sfx)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p, p
    assert "Exchange hashpartitioning" not in p, p
    assert "MapInPandas" not in p and "BatchEvalPython" not in p, p
    # r10: the full rule grammar (wildcard + exception tables -> up to
    # 3K broadcast joins) keeps the same shape - still ZERO corpus
    # shuffles, no Python
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        load_suffix_rows)

    sfx3 = spark.createDataFrame(
        load_suffix_rows(["com", "co.uk", "*.co.uk", "!shop5.co.uk"]),
        "suffix string, kind string")
    out3 = with_registered_domain_psl(docs, sfx3)
    buf3 = io.StringIO()
    with contextlib.redirect_stdout(buf3):
        out3.explain("formatted")
    p3 = buf3.getvalue()
    assert "BroadcastHashJoin" in p3, p3
    assert "Exchange hashpartitioning" not in p3, p3
    assert "MapInPandas" not in p3 and "BatchEvalPython" not in p3, p3


def test_psl_blocklist_and_cap_use_private_suffix_grain(spark):
    """With the suffix table supplied, a user.github.io blocklist entry
    blocks exactly that user's site (not all of github.io), and the
    domain cap keys each user site separately — the mis-grouping the r8
    verdict named."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        domain_balanced_sample, filter_blocklisted)

    sfx = spark.createDataFrame([("com",), ("io",), ("github.io",)],
                                "suffix string")
    docs = spark.createDataFrame(
        [(1, "https://alice.github.io/a"), (2, "https://bob.github.io/b"),
         (3, "https://www.alice.github.io/c"), (4, "https://ok.com/d")],
        "doc_id long, url string")
    bl = spark.createDataFrame([("alice.github.io",)], "domain string")
    kept = filter_blocklisted(docs, bl, suffixes=sfx)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    # heuristic default (no suffixes): github.io is ONE registered domain
    # -> both users blocked; the PSL grain is the fix
    kept_h = filter_blocklisted(docs, bl)
    assert sorted(r["doc_id"] for r in kept_h.collect()) == [4]
    # an entry that IS a public suffix gets SUFFIX semantics under the
    # PSL grain (otherwise it would normalize to '' and silently block
    # nothing — the r8 inert-entry lesson): github.io blocks every user
    # site under it, ok.com survives
    bl_sfx = spark.createDataFrame([("github.io",)], "domain string")
    kept_s = filter_blocklisted(docs, bl_sfx, suffixes=sfx)
    assert sorted(r["doc_id"] for r in kept_s.collect()) == [4]

    capped = domain_balanced_sample(docs, 1, suffixes=sfx)
    by_dom: dict = {}
    for r in capped.collect():
        if r["kept"]:
            by_dom.setdefault(r["domain"], 0)
            by_dom[r["domain"]] += 1
    # alice has 2 docs capped to 1; bob and ok.com keep theirs
    assert by_dom == {"alice.github.io": 1, "bob.github.io": 1,
                      "ok.com": 1}


def test_psl_loader_normalizes_and_classifies_rules(spark):
    """r9 VERDICT item 2: the loader accepts the real PSL grammar —
    wildcard rows stored as their parent with kind='wildcard', exception
    rows with kind='exception' — and refuses entries deeper than the
    match cap (r9 ADVICE: deeper entries would silently never match)."""
    import pytest

    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        load_suffix_rows)

    rows = load_suffix_rows([
        "// comment", "", "  COM  ", "co.uk", "github.io", "*.ck",
        "!www.ck", "co.uk"])
    assert rows == [("com", "rule"), ("co.uk", "rule"),
                    ("github.io", "rule"), ("ck", "wildcard"),
                    ("www.ck", "exception")]
    # depth guard: a 5-label rule (or a 4-label wildcard parent -> depth
    # 5) exceeds the default max_suffix_labels=4
    with pytest.raises(ValueError, match="match depth 5"):
        load_suffix_rows(["a.b.c.d.e"])
    with pytest.raises(ValueError, match="match depth 5"):
        load_suffix_rows(["*.b.c.d.e"])
    assert load_suffix_rows(["a.b.c.d.e"], max_suffix_labels=5) == [
        ("a.b.c.d.e", "rule")]


def test_psl_wildcard_and_exception_vectors(spark):
    """The publicsuffix.org test vectors for the *.ck / !www.ck pair
    (r9 VERDICT item 2 done-criteria): every direct child of a wildcard
    parent is a public suffix; the exception prevails and is itself the
    registered domain."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        load_suffix_rows, with_registered_domain_psl)

    sfx = spark.createDataFrame(
        load_suffix_rows(["com", "*.ck", "!www.ck"]),
        "suffix string, kind string")
    rows = [
        (1, "ck"),               # wildcard doesn't match the parent -> ''
        (2, "test.ck"),          # IS a wildcard public suffix -> ''
        (3, "b.test.ck"),        # -> b.test.ck
        (4, "a.b.test.ck"),      # -> b.test.ck
        (5, "www.ck"),           # exception: registered domain is itself
        (6, "www.www.ck"),       # -> www.ck
        (7, "x.example.com"),    # plain rules unaffected
    ]
    df = spark.createDataFrame(rows, "id long, host string")
    got = {r["id"]: r["domain"] for r in
           with_registered_domain_psl(df, sfx, host_col="host").collect()}
    assert got == {1: "", 2: "", 3: "b.test.ck", 4: "b.test.ck",
                   5: "www.ck", 6: "www.ck", 7: "example.com"}
    # PSL label-count rule (r10 regression): a wildcard rule only
    # matches hosts with MORE labels than its parent — a host that IS
    # the parent falls through to the implicit '*' (the *.co.uk / co.uk
    # divergence: '' would claim the host is a public suffix; the spec
    # says its registered domain is itself)
    sfx2 = spark.createDataFrame(load_suffix_rows(["*.co.uk"]),
                                 "suffix string, kind string")
    df2 = spark.createDataFrame(
        [(1, "co.uk"), (2, "shop.co.uk"), (3, "x.shop.co.uk")],
        "id long, host string")
    got2 = {r["id"]: r["domain"] for r in
            with_registered_domain_psl(df2, sfx2, host_col="host")
            .collect()}
    assert got2 == {1: "co.uk", 2: "", 3: "x.shop.co.uk"}


def test_psl_official_vector_suite(spark):
    """r10 VERDICT item 6: the vendored publicsuffix.org checkPublicSuffix
    vector suite (tests/fixtures/psl_tests.txt) run end-to-end through
    load_suffix_rows + with_registered_domain_psl against the vendored
    real-list rule subset (tests/fixtures/psl_rules.txt — real file
    grammar: comments, wildcard `*.`, exception `!`, IDN rows).

    Documented deviations from the upstream harness, asserted rather
    than hidden: (a) the engine returns '' (not null) for a host that IS
    a public suffix — the repo's '' convention; (b) null and leading-dot
    inputs are out of contract (extract_host never emits empty labels) —
    those vector rows are enumerated explicitly and excluded; (c) no
    IDNA transcoding — punycode vectors match because the vendored rule
    file carries both forms (the deployment contract in its header)."""
    import os
    import re

    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        load_suffix_rows, with_registered_domain_psl)

    fdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")
    with open(os.path.join(fdir, "psl_rules.txt"), encoding="utf-8") as f:
        rules = load_suffix_rows(f)
    assert ("ck", "wildcard") in rules and ("www.ck", "exception") in rules
    assert ("公司.cn", "rule") in rules  # IDN row loads AS-IS

    vec_re = re.compile(
        r"checkPublicSuffix\((null|'[^']*'), (null|'[^']*')\);")
    vectors: list[tuple[str | None, str | None]] = []
    with open(os.path.join(fdir, "psl_tests.txt"), encoding="utf-8") as f:
        for line in f:
            if line.lstrip().startswith("//"):
                continue
            m = vec_re.search(line)
            if m:
                vectors.append(tuple(
                    None if g == "null" else g[1:-1] for g in m.groups()))
    assert len(vectors) >= 75  # the suite genuinely loaded (78 vendored)

    skipped = [(h, w) for h, w in vectors if h is None or h.startswith(".")]
    # deviation (b): exactly the null-input + leading-dot rows, all of
    # which upstream expects null for — nothing substantive is skipped
    assert all(w is None for _, w in skipped) and len(skipped) == 5
    cases = [(h, w) for h, w in vectors if h is not None
             and not h.startswith(".")]

    sfx = spark.createDataFrame(rules, "suffix string, kind string")
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {r["host"]: r["domain"] for r in
           with_registered_domain_psl(df, sfx, host_col="host").collect()}
    bad = []
    for h, want in cases:
        want_engine = "" if want is None else want  # deviation (a)
        if got[h] != want_engine:
            bad.append((h, want_engine, got[h]))
    assert not bad, f"official PSL vectors diverged: {bad}"


def test_psl_suffix_table_duplicates_do_not_fan_out(spark):
    """r9 ADVICE (medium): duplicate suffix entries (ICANN+private union)
    must not duplicate corpus rows through the broadcast left joins."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        with_registered_domain_psl)

    sfx = spark.createDataFrame(
        [("com",), ("com",), ("github.io",), ("github.io",)],
        "suffix string")
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x"), (2, "https://alice.github.io/y")],
        "doc_id long, url string")
    out = with_registered_domain_psl(docs, sfx).collect()
    assert len(out) == 2
    assert {r["doc_id"]: r["domain"] for r in out} == {
        1: "example.com", 2: "alice.github.io"}


def test_psl_blocklist_suffix_entry_blocks_apex_host(spark):
    """r9 ADVICE (low) / verdict watch item 2 closed: a suffix-class
    blocklist entry (github.io) blocks pages served at the apex host
    itself, not only sites under it — no doc with registered domain ''
    is silently unblockable."""
    from data_engineering_etl_pipeline_spark.extensions.weburl import (
        filter_blocklisted)

    sfx = spark.createDataFrame([("com",), ("io",), ("github.io",)],
                                "suffix string")
    docs = spark.createDataFrame(
        [(1, "https://github.io/pages"),       # apex host itself
         (2, "https://alice.github.io/a"),     # site under the suffix
         (3, "https://ok.com/d")],
        "doc_id long, url string")
    bl = spark.createDataFrame([("github.io",)], "domain string")
    kept = filter_blocklisted(docs, bl, suffixes=sfx)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]
