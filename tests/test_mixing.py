"""Source-mixture construction (extensions/mixing.py): temperature
weights, largest-remainder budget allocation, and the two-phase
token-budget prefix fill — value-checked against DuckDB twins (zero
tolerance on the integer fill DECISION, round-6 on the libm-pow weight
VALUES) plus the duplicate/NULL-key/layout contracts the sampling
family pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_etl_pipeline_spark.caching import engine_pin_scope
from data_engineering_etl_pipeline_spark.extensions.mixing import (
    allocate_budgets, mixture_weights, mixture_weights_sql,
    sample_to_token_budget, temperature_sample, token_budget_sql)
from data_engineering_etl_pipeline_spark.io import load_table

from .conftest import SF_DIR, assert_matches_oracle, partition_layouts

_BUDGETS = {"en": 5000, "de": 2000, "es": 800, "fr": 0}


def test_token_budget_fill_matches_duckdb_twin(spark, duck):
    """The fill DECISION on the real documents table (length(text) as the
    token mass — any integer both engines agree on exactly): same
    portable hash order, same inclusive-prefix rule, zero tolerance.
    'fr' proves a zero budget keeps nothing; any language absent from
    the dict (zh) keeps nothing."""
    with engine_pin_scope():
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "lang", F.length("text").alias("n_tokens"))
        got = sample_to_token_budget(docs, _BUDGETS, key_col="lang",
                                     token_col="n_tokens",
                                     salt="mix-test-1")
        twin = token_budget_sql("doc_id", "lang", "length(text)",
                                _BUDGETS, "mix-test-1")
        sql = (f"SELECT id AS doc_id, key AS lang, tokens AS n_tokens, "
               f"kept FROM ({twin})")
        assert_matches_oracle(got, duck, sql, "token_budget_fill")


def test_mixture_weights_match_duckdb_at_round6(spark, duck):
    """Weight VALUES at the documented round-6 libm-pow tolerance; the
    count column is exact."""
    docs = load_table(spark, SF_DIR, "documents")
    got = (mixture_weights(docs, "lang", alpha=0.3)
           .select("source", "n", F.round("weight", 6).alias("weight")))
    assert_matches_oracle(got, duck, mixture_weights_sql("lang", 0.3),
                          "mixture_weights")
    # token-mass variant: n = sum of a token column
    got_t = (mixture_weights(docs.withColumn("nt", F.length("text")),
                             "lang", alpha=0.7, token_col="nt")
             .select("source", "n", F.round("weight", 6).alias("weight")))
    assert_matches_oracle(
        got_t, duck, mixture_weights_sql("lang", 0.7, "length(text)"),
        "mixture_weights_tokens")


def test_allocate_budgets_exact_total_and_determinism():
    w = {"en": 0.62, "de": 0.23, "es": 0.15}
    b = allocate_budgets(w, 1000)
    assert sum(b.values()) == 1000
    assert b == allocate_budgets(dict(reversed(list(w.items()))), 1000)
    # largest remainder: 3 equal weights, total 100 -> 34/33/33 with the
    # extra token going to the ascending-first source
    eq = allocate_budgets({"c": 1.0, "a": 1.0, "b": 1.0}, 100)
    assert eq == {"a": 34, "b": 33, "c": 33}
    # weights need not sum to 1; None source sorts last at remainder ties
    assert sum(allocate_budgets({"x": 3.0, None: 3.0}, 7).values()) == 7
    assert allocate_budgets({"x": 1.0, None: 1.0}, 3) == {"x": 2, None: 1}
    assert allocate_budgets({}, 10) == {}
    assert allocate_budgets({"a": 0.0}, 10) == {"a": 0}
    with pytest.raises(ValueError, match="negative"):
        allocate_budgets({"a": -0.1}, 10)
    with pytest.raises(ValueError, match="total_budget"):
        allocate_budgets({"a": 1.0}, -1)


def test_duplicate_copies_share_one_slot_max_token_resolution(spark):
    """(id, key) copies consume ONE budget slot at the MAX token count
    (the layout-sound resolution — see the prune comment), every copy
    carries the shared flag, and the output row count equals the
    input's (the balanced_sample_by_key hygiene contract)."""
    rows = [(1, "a", 6), (1, "a", 100),  # copies: resolve to 100
            (2, "a", 5), (3, "a", 4)]
    with engine_pin_scope():
        df = spark.createDataFrame(rows, "id long, k string, t long")
        out = sample_to_token_budget(df, {"a": 10}, key_col="k",
                                     token_col="t", id_col="id",
                                     salt="dup-test").collect()
    assert len(out) == 4
    flags = {}
    for r in out:
        flags.setdefault(r["id"], set()).add(r["kept"])
    assert all(len(v) == 1 for v in flags.values())  # copies agree
    kept_ids = {r["id"] for r in out if r["kept"]}
    # id 1 resolves to 100 tokens: it can never fit the budget of 10,
    # and the kept prefix must stay budget-consistent
    assert 1 not in kept_ids
    sizes = {1: 100, 2: 5, 3: 4}
    assert sum(sizes[i] for i in kept_ids) <= 10
    # re-running with the SMALLER copy dropped (resolution unchanged)
    # must give the same decision
    with engine_pin_scope():
        df2 = spark.createDataFrame(
            [(1, "a", 100), (2, "a", 5), (3, "a", 4)],
            "id long, k string, t long")
        out2 = sample_to_token_budget(df2, {"a": 10}, key_col="k",
                                      token_col="t", id_col="id",
                                      salt="dup-test").collect()
    assert {r["id"] for r in out2 if r["kept"]} == kept_ids


def test_null_key_group_null_tokens_and_const_budget(spark):
    """A None budget entry reaches the NULL-key group (null-safe join in
    BOTH phases), NULL token counts cost 0, and an int budget applies to
    every key."""
    rows = [(1, None, 4), (2, None, 4), (3, None, None),
            (4, "a", 9), (5, "a", 9)]
    with engine_pin_scope():
        df = spark.createDataFrame(rows, "id long, k string, t long")
        out = {r["id"]: r["kept"] for r in sample_to_token_budget(
            df, {None: 8, "a": 9}, key_col="k", token_col="t",
            id_col="id", salt="null-test").collect()}
    # NULL group: two 4-token docs fill the budget of 8 exactly; the
    # NULL-token doc is free IF it lands within the prefix — either way
    # both 4-token docs fit and 'a' keeps exactly one 9-token doc
    assert sum(1 for i in (4, 5) if out[i]) == 1
    assert out[1] and out[2]
    with engine_pin_scope():
        const = {r["id"]: r["kept"] for r in sample_to_token_budget(
            df, 9, key_col="k", token_col="t", id_col="id",
            salt="null-test").collect()}
    assert sum(1 for i in (4, 5) if const[i]) == 1
    with pytest.raises(ValueError, match="budget"):
        sample_to_token_budget(df, -1, key_col="k", token_col="t",
                               id_col="id")
    with pytest.raises(ValueError, match="negative"):
        sample_to_token_budget(df, {"a": -5}, key_col="k", token_col="t",
                               id_col="id")


def test_two_phase_prune_layout_invariance(spark):
    """The partition-local prefix prune must be layout-invariant (the r8
    partition_layouts discipline): default spread and coalesce(1) give
    identical kept sets — and both equal the naive single-window Spark
    computation over the same hash order."""
    rows = [(i, "k" + str(i % 3), (i * 7) % 11 + 1) for i in range(120)]
    budgets = {"k0": 40, "k1": 15, "k2": 0}
    base = spark.createDataFrame(rows, "id long, k string, t long")
    kept_sets = []
    for label, df in partition_layouts(base):
        with engine_pin_scope():
            out = sample_to_token_budget(df, budgets, key_col="k",
                                         token_col="t", id_col="id",
                                         salt="layout-test")
            kept_sets.append((label,
                              {r["id"] for r in out.collect() if r["kept"]}))
    assert kept_sets[0][1] == kept_sets[1][1]
    from pyspark.sql import Window
    from data_engineering_etl_pipeline_spark.extensions.mixing import _hv
    w = (Window.partitionBy("k").orderBy(F.col("__hv").asc(),
                                         F.col("id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = (base.withColumn("__hv", _hv("id", "layout-test"))
             .withColumn("__cum", F.sum("t").over(w))
             .withColumn("__b", F.when(F.col("k") == "k0", 40)
                         .when(F.col("k") == "k1", 15).otherwise(0))
             .filter(F.col("__cum") <= F.col("__b")))
    assert {r["id"] for r in naive.collect()} == kept_sets[0][1]


def test_temperature_sample_end_to_end(spark):
    """The composed op: per-source kept token mass never exceeds the
    allocated budget, budgets sum to exactly the total, and the whole
    thing is rerun-deterministic."""
    rows = [(i, ["en", "en", "en", "de"][i % 4], 10 + (i % 5))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nt long")
    with engine_pin_scope():
        out = temperature_sample(df, source_col="lang", token_col="nt",
                                 total_budget=900, alpha=0.5,
                                 id_col="doc_id", salt="temp-test")
        got = out.collect()
    w = {r["source"]: r["weight"] for r in
         mixture_weights(df, "lang", 0.5, token_col="nt").collect()}
    budgets = allocate_budgets(w, 900)
    assert sum(budgets.values()) == 900
    kept_mass = {}
    for r in got:
        if r["kept"]:
            kept_mass[r["lang"]] = kept_mass.get(r["lang"], 0) + r["nt"]
    for lang, mass in kept_mass.items():
        assert mass <= budgets[lang], (lang, mass, budgets)
    # flattening: de (the rare source) gets a larger budget share than
    # its natural token share under alpha < 1
    nat = {r["source"]: r["n"] for r in
           mixture_weights(df, "lang", 1.0, token_col="nt").collect()}
    de_nat = nat["de"] / sum(nat.values())
    assert budgets["de"] / 900 > de_nat
    with engine_pin_scope():
        rerun = {(r["doc_id"], r["kept"]) for r in
                 temperature_sample(df, source_col="lang", token_col="nt",
                                    total_budget=900, alpha=0.5,
                                    id_col="doc_id",
                                    salt="temp-test").collect()}
    assert rerun == {(r["doc_id"], r["kept"]) for r in got}


def test_prep_mixture_stage_composition(spark):
    """r10 composition: prepare_training_corpus(mixture=...) keeps
    exactly the docs temperature_sample selects over the cleaned
    corpus's whitespace-token mass (source read back from the raw
    frame by id); off by default so the prep driver oracle is
    untouched."""
    from data_engineering_etl_pipeline_spark.extensions.prep import (
        prepare_training_corpus)

    def page(tag):
        w = [f"{tag}{chr(97 + k)}{chr(97 + (k * 7) % 26)}word"
             for k in range(18)]
        return "\n".join((" ".join(w[:6]) + ".", " ".join(w[6:12]) + ".",
                          " ".join(w[12:]) + "!"))

    rows = [(i, page(f"s{chr(97 + i // 26)}{chr(97 + i % 26)}x"),
             "en" if i < 24 else "de") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    with engine_pin_scope():
        base = prepare_training_corpus(docs, min_quality=0.01).toPandas()
    assert len(base) == 30  # clean corpus: nothing drops without mixture
    cand_rows = [(int(r["doc_id"]), "en" if r["doc_id"] < 24 else "de",
                  len(r["text"].split())) for _, r in base.iterrows()]
    cand = spark.createDataFrame(cand_rows, "doc_id long, lang string, nt long")
    with engine_pin_scope():
        exp = {r["doc_id"] for r in
               temperature_sample(cand, "lang", "nt", total_budget=300,
                                  alpha=0.5, salt="mix-prep").collect()
               if r["kept"]}
        got = {r["doc_id"] for r in prepare_training_corpus(
            docs, min_quality=0.01,
            mixture={"total_budget": 300, "alpha": 0.5,
                     "salt": "mix-prep"}).collect()}
    # every doc is 18 whitespace tokens: en 432, de 108; sqrt weights
    # split 300 -> 200/100 -> 11 en + 5 de docs survive
    assert got == exp
    assert len(got) == 16


def test_negative_tokens_clamped_and_null_ids_never_kept(spark, duck):
    """Review findings pinned: (a) negative token counts (F.size of a
    NULL array is -1) are clamped to 0 in BOTH engines — a negative
    mass would break the prune's monotone-prefix soundness; (b) NULL
    ids are never budget candidates (kept=False, consuming nothing)
    and the twin mirrors by excluding them."""
    rows = [(1, "a", -7), (2, "a", 5), (None, "a", 1), (3, "a", 6)]
    with engine_pin_scope():
        df = spark.createDataFrame(rows, "id long, k string, t long")
        out = {r["id"]: (r["kept"], r["t"]) for r in
               sample_to_token_budget(df, {"a": 11}, key_col="k",
                                      token_col="t", id_col="id",
                                      salt="neg-test").collect()}
    assert len(out) == 4  # every row flagged, incl. the NULL id
    assert out[None][0] is False
    assert out[1][1] == 0  # clamped in the returned token column too
    # clamped doc 1 is free: 0 + 5 + 6 == 11 fits, all non-null kept
    assert out[1][0] and out[2][0] and out[3][0]
    # DuckDB twin agrees decision-for-decision on the same rows
    duck.execute("CREATE OR REPLACE TABLE negrows(id BIGINT, k VARCHAR, "
                 "t BIGINT)")
    duck.executemany("INSERT INTO negrows VALUES (?, ?, ?)", rows)
    twin = token_budget_sql("id", "k", "t", {"a": 11}, "neg-test",
                            table="negrows")
    want = {r[0]: r[3] for r in duck.execute(twin).fetchall()}
    assert want == {1: True, 2: True, 3: True}  # NULL id excluded
    duck.execute("DROP TABLE negrows")


def test_quoted_budget_keys_and_all_zero_mass(spark, duck):
    """Review findings pinned: (a) a budget key containing a single
    quote must embed as a doubled-quote SQL literal, not repr()'s
    double-quoted identifier; (b) a corpus whose every source has zero
    token mass allocates all-zero budgets instead of raising."""
    twin = token_budget_sql("id", "k", "t", {"o'neil": 5}, "q-test",
                            table="(SELECT 1 AS id, 'o''neil' AS k, "
                                  "3 AS t)")
    rows = duck.execute(twin).fetchall()
    assert rows == [(1, "o'neil", 3, True)]
    zero = spark.createDataFrame([(1, "a", 0), (2, "b", None)],
                                 "doc_id long, lang string, nt long")
    with engine_pin_scope():
        out = temperature_sample(zero, source_col="lang", token_col="nt",
                                 total_budget=100, alpha=0.5)
        got = {r["doc_id"]: r["kept"] for r in out.collect()}
    # zero-mass sources get zero budgets; zero-token docs at budget 0
    # have inclusive cum 0 <= 0 and are kept (they are free)
    assert got == {1: True, 2: True}


def test_incremental_fill_across_batches(spark, duck):
    """Continuous-ingest fill (the incremental_exact_dedup convention):
    (a) every batch's DECISION hash-matches the DuckDB twin under the
    REMAINING budgets; (b) total kept mass across batches never exceeds
    the budget; (c) earlier keepers are never displaced (ingest order
    is the semantics); (d) replaying a batch against the same state is
    idempotent; (e) the state equals the kept mass exactly."""
    from data_engineering_etl_pipeline_spark.extensions.mixing import (
        incremental_token_budget_fill)

    budgets = {"a": 20, "b": 4}
    b1 = spark.createDataFrame(
        [(1, "a", 7), (2, "a", 6), (3, "a", 9), (10, "b", 5)],
        "id long, k string, t long")
    b2 = spark.createDataFrame(
        [(4, "a", 7), (5, "a", 2), (11, "b", 3), (12, "b", 1)],
        "id long, k string, t long")
    with engine_pin_scope():
        f1, s1 = incremental_token_budget_fill(
            b1, None, budgets, key_col="k", token_col="t", id_col="id",
            salt="incr-mix")
        flags1 = {r["id"]: r["kept"] for r in f1.collect()}
        state1 = {r["k"]: r["consumed"] for r in s1.collect()}
    kept1_mass = {k: 0 for k in budgets}
    sizes = {1: 7, 2: 6, 3: 9, 10: 5, 4: 7, 5: 2, 11: 3, 12: 1}
    keys = {1: "a", 2: "a", 3: "a", 10: "b", 4: "a", 5: "a",
            11: "b", 12: "b"}
    for i, kept in flags1.items():
        if kept:
            kept1_mass[keys[i]] += sizes[i]
    # keys with zero kept mass are simply absent from the state
    assert state1 == {k: m for k, m in kept1_mass.items() if m}
    assert not flags1[10]  # b: 5 > 4, never fits
    with engine_pin_scope():
        f2, s2 = incremental_token_budget_fill(
            b2, s1, budgets, key_col="k", token_col="t", id_col="id",
            salt="incr-mix")
        flags2 = {r["id"]: r["kept"] for r in f2.collect()}
        state2 = {r["k"]: r["consumed"] for r in s2.collect()}
        # (d) replay idempotence: same state -> same flags
        f2r, _ = incremental_token_budget_fill(
            b2, s1, budgets, key_col="k", token_col="t", id_col="id",
            salt="incr-mix")
        assert {r["id"]: r["kept"] for r in f2r.collect()} == flags2
    # (b) budget never exceeded across batches
    total = dict(kept1_mass)
    for i, kept in flags2.items():
        if kept:
            total[keys[i]] += sizes[i]
    assert total["a"] <= 20 and total["b"] <= 4
    assert state2 == {k: m for k, m in total.items() if m}
    # (a) batch-2 decision hash-matches the twin under remaining budgets
    remaining = {k: budgets[k] - state1.get(k, 0) for k in budgets}
    duck.execute("CREATE OR REPLACE TABLE b2rows(id BIGINT, k VARCHAR, "
                 "t BIGINT)")
    duck.executemany("INSERT INTO b2rows VALUES (?, ?, ?)",
                     [(4, "a", 7), (5, "a", 2), (11, "b", 3),
                      (12, "b", 1)])
    twin = token_budget_sql("id", "k", "t", remaining, "incr-mix",
                            table="b2rows")
    want = {r[0]: r[3] for r in duck.execute(twin).fetchall()}
    assert want == flags2
    duck.execute("DROP TABLE b2rows")
    with pytest.raises(ValueError, match="negative"):
        incremental_token_budget_fill(b2, s1, {"a": -1}, key_col="k",
                                      token_col="t", id_col="id")


def test_incremental_fill_duplicate_copies_charge_budget_once(spark):
    """r10 advisor (medium): a batch carrying duplicate (id, key) copies
    must charge the consumed state ONCE per entity, at the MAX-resolved
    token — not once per copy — or later batches see a silently shrunken
    remaining budget."""
    from data_engineering_etl_pipeline_spark.extensions.mixing import (
        incremental_token_budget_fill)

    # id 1 appears THREE times (masses 2/5/5 -> entity mass 5); id 2 once
    b1 = spark.createDataFrame(
        [(1, "a", 2), (1, "a", 5), (1, "a", 5), (2, "a", 4)],
        "id long, k string, t long")
    with engine_pin_scope():
        f1, s1 = incremental_token_budget_fill(
            b1, None, {"a": 20}, key_col="k", token_col="t", id_col="id",
            salt="dup-incr")
        flags1 = {(r["id"], r["kept"]) for r in f1.collect()}
        state1 = {r["k"]: r["consumed"] for r in s1.collect()}
    assert flags1 == {(1, True), (2, True)}
    # entity grain: 5 (MAX of the copies) + 4 — NOT 2+5+5+4 = 16
    assert state1 == {"a": 9}
    # the surviving 11 tokens of budget admit an 11-token day-2 doc —
    # impossible under the per-copy overcount
    b2 = spark.createDataFrame([(3, "a", 11)], "id long, k string, t long")
    with engine_pin_scope():
        f2, s2 = incremental_token_budget_fill(
            b2, s1, {"a": 20}, key_col="k", token_col="t", id_col="id",
            salt="dup-incr")
        assert [r["kept"] for r in f2.collect()] == [True]
        assert {r["k"]: r["consumed"] for r in s2.collect()} == {"a": 20}


def test_mixture_weights_clamp_negative_mass(spark, duck):
    """r10 advisor (low): negative per-row token masses (F.size of a
    NULL array is -1) clamp to 0 in both engines — no NaN weights, no
    skewed normalizer."""
    rows = [(1, "a", -3), (2, "a", 10), (3, "b", 5), (4, "b", -1)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, nt long")
    got = {r["source"]: (r["n"], round(r["weight"], 6)) for r in
           mixture_weights(df, "lang", alpha=0.5, token_col="nt").collect()}
    assert got["a"][0] == 10 and got["b"][0] == 5
    assert all(w == w for _, w in got.values())  # no NaN
    duck.execute("CREATE OR REPLACE TABLE negmass(doc_id BIGINT, "
                 "lang VARCHAR, nt BIGINT)")
    duck.executemany("INSERT INTO negmass VALUES (?, ?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in duck.execute(
        mixture_weights_sql("lang", 0.5, "nt", table="negmass")).fetchall()}
    assert want == got
    duck.execute("DROP TABLE negmass")
    # an all-negative source clamps to mass 0 and allocate_budgets
    # receives a finite weight (0), not NaN
    neg = spark.createDataFrame([(1, "x", -5)],
                                "doc_id long, lang string, nt long")
    with engine_pin_scope():
        out = temperature_sample(neg, source_col="lang", token_col="nt",
                                 total_budget=10, alpha=0.5,
                                 id_col="doc_id")
        assert [r["kept"] for r in out.collect()] == [True]  # clamped 0 fits


def test_token_budget_sql_empty_budgets_valid(spark, duck):
    """r10 advisor (low): an empty budget dict must emit VALID SQL (a
    typed empty relation) reproducing the engine's all-budget-0 answer."""
    twin = token_budget_sql("id", "k", "t", {}, "empty-test",
                            table="(SELECT 1 AS id, 'a' AS k, 3 AS t "
                                  "UNION ALL SELECT 2, 'a', 0)")
    want = {r[0]: r[3] for r in duck.execute(twin).fetchall()}
    # the 3-token doc can never fit budget 0; the zero-token doc is free
    # only if it hash-orders first (prefix still within budget)
    assert want[1] is False
    df = spark.createDataFrame([(1, "a", 3), (2, "a", 0)],
                               "id long, k string, t long")
    with engine_pin_scope():
        got = {r["id"]: r["kept"] for r in
               sample_to_token_budget(df, {}, key_col="k", token_col="t",
                                      id_col="id",
                                      salt="empty-test").collect()}
    assert got == want
