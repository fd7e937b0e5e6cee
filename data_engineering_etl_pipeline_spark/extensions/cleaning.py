"""C4-style line-level corpus cleaning (SURVEY.md §2.11 extension family):
the rule set Raffel et al. 2020 (T5 / C4, JMLR 21(140) §2.2) applied to
produce the "Colossal Clean Crawled Corpus", re-expressed as native Spark
column expressions:

- keep only lines that end in a terminal punctuation mark;
- keep only lines with at least 5 words;
- drop any line containing the word "javascript";
- drop any PAGE containing "lorem ipsum";
- drop any PAGE containing a curly bracket (code);
- drop any PAGE whose cleaned text has fewer than 3 sentences;
- (optional) drop any page containing a word from a caller-supplied
  blocklist (C4 used the public "List of Dirty, Naughty ..." list; the
  list itself is a parameter here, empty by default).

Scale design: everything is a chain of split / filter-lambda / regexp
column expressions — JVM-side, map-only, zero shuffle, zero Python — so
the cleaner streams through a 100 TB scan at scan speed, like
``extensions/pii.py``. Every builder has a DuckDB SQL twin (same rule, same
regex, RE2-compatible) so oracles can verify kept-line sets and the cleaned
text bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
# terminal punctuation incl. closing double-quote, tested on the
# right-trimmed line (C4: "ended in a terminal punctuation mark")
C4_TERMINAL_RE = r'[.!?"]$'
C4_SENTENCE_RE = r"[.!?]"


def _col(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def _line_keep(line: Column) -> Column:
    """Per-line C4 predicate: terminal punctuation, >=5 words, no
    'javascript' (case-insensitive)."""
    return (
        F.rtrim(line).rlike(C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(line), r"\s+")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(line).contains("javascript")
    )


def _line_keep_sql(var: str = "l") -> str:
    """DuckDB lambda-body twin of :func:`_line_keep`."""
    return (
        f"regexp_matches(rtrim({var}), '{C4_TERMINAL_RE}') AND "
        f"len(string_split_regex(trim({var}), '\\s+')) >= {C4_MIN_LINE_WORDS}"
        f" AND NOT contains(lower({var}), 'javascript')"
    )


def c4_kept_lines(text: str | Column) -> Column:
    """Array of the lines of ``text`` that survive the line rules."""
    return F.filter(F.split(_col(text), "\n"), _line_keep)


def c4_kept_lines_sql(expr: str) -> str:
    return (f"list_filter(string_split({expr}, chr(10)), "
            f"l -> {_line_keep_sql('l')})")


def c4_stats(text: str | Column,
             blocklist: list[str] | None = None) -> list[Column]:
    """The full per-page C4 cleaning verdict as named columns:
    ``n_lines, n_kept, cleaned, n_sentences, has_lorem, has_brace,
    keep_page``. ``cleaned`` is the kept lines re-joined with newlines;
    ``keep_page`` additionally requires >=3 sentences in the CLEANED text
    and no page-level flag. Pure expressions; compute once per row."""
    t = _col(text)
    kept = c4_kept_lines(t)
    cleaned = F.concat_ws("\n", kept)
    n_sent = F.size(F.regexp_extract_all(
        cleaned, F.lit(C4_SENTENCE_RE), F.lit(0)))
    has_lorem = F.lower(t).contains("lorem ipsum")
    # "a curly bracket" means either brace: a truncated code fragment can
    # carry only the closing one (r4 review finding).
    has_brace = t.contains("{") | t.contains("}")
    blocked = F.lit(False)
    for w in (blocklist or []):
        blocked = blocked | F.lower(t).contains(w.lower())
    keep = ((n_sent >= C4_MIN_SENTENCES)
            & ~has_lorem & ~has_brace & ~blocked)
    return [
        F.size(F.split(t, "\n")).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        cleaned.alias("cleaned"),
        n_sent.cast("int").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.alias("keep_page"),
    ]


def c4_stats_sql(expr: str, blocklist: list[str] | None = None) -> list[str]:
    """DuckDB twin of :func:`c4_stats` over the SQL expression ``expr`` —
    identical rules, identical column names."""
    kept = c4_kept_lines_sql(expr)
    cleaned = f"array_to_string({kept}, chr(10))"
    n_sent = f"len(regexp_extract_all({cleaned}, '{C4_SENTENCE_RE}'))"
    has_lorem = f"contains(lower({expr}), 'lorem ipsum')"
    has_brace = f"(contains({expr}, '{{') OR contains({expr}, '}}'))"
    # single quotes doubled: a blocklist word like "don't" must not break
    # (or inject into) the generated SQL (r4 review finding)
    blocked = " OR ".join(
        [f"contains(lower({expr}), '{w.lower().replace(chr(39), chr(39) * 2)}')"
         for w in (blocklist or [])]
    ) or "FALSE"
    return [
        f"CAST(len(string_split({expr}, chr(10))) AS INT) AS n_lines",
        f"CAST(len({kept}) AS INT) AS n_kept",
        f"{cleaned} AS cleaned",
        f"CAST({n_sent} AS INT) AS n_sentences",
        f"{has_lorem} AS has_lorem",
        f"{has_brace} AS has_brace",
        f"({n_sent} >= {C4_MIN_SENTENCES} AND NOT {has_lorem} AND NOT "
        f"{has_brace} AND NOT ({blocked})) AS keep_page",
    ]
