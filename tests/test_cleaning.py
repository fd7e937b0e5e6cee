"""C4 line-filter rules (extensions/cleaning.py) on hand-reasoned pages,
plus the DuckDB-twin equivalence of the SQL builders on arbitrary text —
the same check the registry row performs at sf0.01, run here on adversarial
page shapes (empty lines, whitespace padding, rule-boundary word counts)."""

from __future__ import annotations

import duckdb

from data_engineering_etl_pipeline_spark.extensions.cleaning import (
    c4_stats, c4_stats_sql)


PAGES = [
    # every rule: short line, no-punct line, javascript line, good lines
    (0, "This is a perfectly fine sentence.\n"
        "too short.\n"
        "this line has no terminal punctuation at all\n"
        "Please enable JavaScript here.\n"
        "Another good sentence appears right here!\n"
        "And one more to clear the minimum?"),
    # lorem ipsum page: lines pass but the page is dropped
    (1, "A good first sentence sits here.\n"
        "Some lorem ipsum filler follows along.\n"
        "A good third sentence closes it out."),
    # curly bracket page (code)
    (2, "A good first sentence sits here.\n"
        "var config = { enabled: true };\n"
        "A good third sentence closes it out."),
    # too few sentences after cleaning (only 2 kept)
    (3, "One good sentence lives right here.\n"
        "nope\n"
        "Two good sentences live right here."),
    # close-brace-only page: "a curly bracket" covers both braces
    (6, "A good first sentence sits here.\n"
        "stray fragment ends abruptly };\n"
        "A good third sentence closes it out."),
    # whitespace-padded terminal punctuation still counts (rtrim)
    (4, "Padded terminal punctuation still counts fine.   \n"
        "Second sentence arrives on schedule now.\n"
        "Third sentence arrives on schedule too."),
    # exactly 5 words = kept; 4 words = dropped
    (5, "Exactly five words right here.\n"
        "Only four words here.\n"
        "Second keeper sentence shows up now.\n"
        "Third keeper sentence shows up too."),
]


def _spark_rows(spark, blocklist=None):
    df = spark.createDataFrame(PAGES, "doc_id long, text string")
    out = df.select("doc_id", *c4_stats("text", blocklist=blocklist))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_c4_hand_cases(spark):
    out = _spark_rows(spark)
    r0 = out[0]
    assert r0["n_lines"] == 6 and r0["n_kept"] == 3
    assert r0["n_sentences"] == 3 and r0["keep_page"] is True
    assert "JavaScript" not in r0["cleaned"]
    assert "no terminal punctuation" not in r0["cleaned"]
    assert out[1]["has_lorem"] is True and out[1]["keep_page"] is False
    assert out[2]["has_brace"] is True and out[2]["keep_page"] is False
    # doc 3: 2 kept lines -> 2 sentences < 3 -> page dropped
    assert out[3]["n_kept"] == 2 and out[3]["keep_page"] is False
    assert out[4]["n_kept"] == 3 and out[4]["keep_page"] is True
    # doc 6: close brace alone must trip the page drop (r4 review finding)
    assert out[6]["has_brace"] is True and out[6]["keep_page"] is False
    # doc 5: the 4-word line is dropped, the 5-word line kept
    assert out[5]["n_kept"] == 3
    assert "Only four words" not in out[5]["cleaned"]
    assert "Exactly five words" in out[5]["cleaned"]


def test_c4_blocklist_drops_page(spark):
    out = _spark_rows(spark, blocklist=["schedule"])
    # pages 4 contains 'schedule'; line rules unchanged, page verdict flips
    assert out[4]["n_kept"] == 3 and out[4]["keep_page"] is False
    assert out[0]["keep_page"] is True


def test_c4_sql_twin_matches_spark(spark):
    """The SQL builders must reproduce the Spark columns bit-for-bit on the
    adversarial pages (same check as the doc_c4_line_filter oracle, harder
    inputs)."""
    sdf = (spark.createDataFrame(PAGES, "doc_id long, text string")
           .select("doc_id", *c4_stats("text", blocklist=["schedule", "don't"]))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", PAGES)
    cols = ",\n".join(c4_stats_sql("text", blocklist=["schedule", "don't"]))
    odf = (con.execute(f"SELECT doc_id, {cols} FROM pages").df()
           .sort_values("doc_id").reset_index(drop=True))
    for c in sdf.columns:
        assert list(sdf[c]) == list(odf[c].astype(sdf[c].dtype)), c
