"""HTML text extraction + boilerplate removal — the front door of a
web-crawl curation pipeline.

Web corpora (CommonCrawl WARC/WET-style) arrive as HTML; every downstream
operator in this package (quality, language-ID, dedup, packing) wants the
VISIBLE MAIN text. This module turns an HTML column into that text with a
jusText/trafilatura-style *line-level* heuristic, expressed entirely as
Spark column expressions (regex + higher-order array functions) so the hot
path stays inside whole-stage codegen — no Python, no UDF, no shuffle: the
operator is scan-shaped and scales linearly with input bytes.

Pipeline (all per-row, engine-portable regex only):

1. drop invisible content: ``<script>``/``<style>`` blocks + comments;
2. convert block-level tags (``<p> <div> <li> <h1> ...``) to newlines so
   the document's visual line structure survives tag stripping;
3. per LINE: strip remaining inline tags, decode the common HTML entities,
   collapse whitespace; compute ``wc`` (word count) and ``lc`` (characters
   of anchor text — the link mass);
4. keep lines with ``wc >= min_words`` and link density
   ``lc/len <= max_link_density`` (integer milli-units — no float
   boundary ambiguity cross-engine); join survivors with newlines.

Boilerplate (nav bars, footers, link farms) is short and link-dense; body
text is long and link-sparse — the same signal jusText's CLASSIFY step uses
(stopword density is already available downstream via
``text.stopword_ratio`` for corpora that need the stricter form).

Every regex uses explicit ASCII whitespace classes and ``(?is)`` inline
flags so Java regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte;
:func:`duckdb_extract_sql` builds the oracle twin from the SAME pattern
constants.

Reference parity: none — the reference ingests CSV/JSON/Excel/Parquet only
(src/pipeline/read/factory.py:14-22); this operator is part of the
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_file_loader_spark.functions import bind_once

# ---------------------------------------------------------------------------
# shared pattern constants (Spark + DuckDB build from the same strings)
# ---------------------------------------------------------------------------

#: invisible content: removed wholesale before any line logic
INVISIBLE_PATTERNS: tuple[str, ...] = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)

#: block-level tags (open or close) -> line break. html/head/title/body are
#: included so stray head text ("<title>Doc 3</title>") isolates onto its
#: own (short, hence dropped) line instead of gluing to the first paragraph.
_BLOCK_TAGS = (
    "html|head|title|body|main|aside|p|div|li|ul|ol|h[1-6]|tr|td|th|table|"
    "br|hr|section|article|header|footer|nav|blockquote|pre|form"
)
BLOCK_TAG_PATTERN = rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>"

#: any remaining (inline) tag
ANY_TAG_PATTERN = r"(?s)<[^>]*>"

#: anchor content (group 1) — the line's "link mass"
ANCHOR_PATTERN = r"(?is)<a\b[^>]*>(.*?)</a>"

#: common entities, decoded in order — ``&amp;`` strictly LAST so already-
#: decoded ampersands are never re-expanded
ENTITY_MAP: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: ASCII whitespace EXCEPT newline (lines are already split); explicit class
#: because Java \s and RE2 \s disagree on \x0b
WS_CLASS = r"[ \t\x0b\f\r]"


# ---------------------------------------------------------------------------
# Spark column expressions
# ---------------------------------------------------------------------------


def visible_html(col: Column) -> Column:
    """HTML with script/style blocks and comments removed."""
    out = col
    for pat in INVISIBLE_PATTERNS:
        out = F.regexp_replace(out, pat, "")
    return out


def _block_breaks(col: Column) -> Column:
    return F.regexp_replace(col, BLOCK_TAG_PATTERN, "\n")


def clean_fragment(col: Column) -> Column:
    """Inline tags stripped, entities decoded, whitespace collapsed+trimmed."""
    out = F.regexp_replace(col, ANY_TAG_PATTERN, "")
    for ent, rep in ENTITY_MAP:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, WS_CLASS + "+", " ")
    return F.regexp_replace(out, "^ | $", "")


def _word_count(clean: Column) -> Column:
    return F.when(F.length(clean) == 0, F.lit(0)).otherwise(
        F.size(F.split(clean, " ", -1))
    )


def _link_chars(raw_line: Column) -> Column:
    """Characters of cleaned anchor text in the raw (still-tagged) line."""
    anchors = F.regexp_extract_all(raw_line, F.lit(ANCHOR_PATTERN), 1)
    return F.aggregate(
        F.transform(anchors, lambda a: F.length(clean_fragment(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _line_structs(col: Column) -> Column:
    """array<struct<text,wc,lc>> per visual line of the page. ``bind_once``
    evaluates the regex-clean chain once per line (HOF bodies block
    common-subexpression elimination)."""
    lines = F.split(_block_breaks(visible_html(col)), "\n", -1)
    return F.transform(
        lines,
        lambda line: bind_once(
            clean_fragment(line),
            lambda t: F.struct(
                t.alias("text"),
                _word_count(t).alias("wc"),
                _link_chars(line).alias("lc"),
            ),
        ),
    )


def _keep(min_words: int, max_link_density_milli: int):
    return lambda s: (s["wc"] >= min_words) & (
        s["lc"] * 1000 <= max_link_density_milli * F.length(s["text"])
    )


def extract_text(
    col: Column, min_words: int = 3, max_link_density_milli: int = 500
) -> Column:
    """Visible main text of an HTML column: content lines joined by newline."""
    keep = _keep(min_words, max_link_density_milli)
    return bind_once(
        _line_structs(col),
        lambda arr: F.array_join(
            F.transform(F.filter(arr, keep), lambda s: s["text"]), "\n"
        ),
    )


def extract_struct(
    col: Column, min_words: int = 3, max_link_density_milli: int = 500
) -> Column:
    """struct<text, n_lines, n_kept>: extracted text + line accounting
    (``n_lines`` counts non-empty visual lines BEFORE the boilerplate
    filter, so kept/total is the page's content density)."""
    keep = _keep(min_words, max_link_density_milli)
    return bind_once(
        _line_structs(col),
        lambda arr: F.struct(
            F.array_join(
                F.transform(F.filter(arr, keep), lambda s: s["text"]), "\n"
            ).alias("text"),
            F.size(F.filter(arr, lambda s: s["wc"] > 0)).alias("n_lines"),
            F.size(F.filter(arr, keep)).alias("n_kept"),
        ),
    )


def extract_html(
    df: DataFrame,
    html_col: str,
    out_col: str = "extracted",
    min_words: int = 3,
    max_link_density_milli: int = 500,
) -> DataFrame:
    """Add ``out_col`` (visible text), ``{out_col}_lines``, ``{out_col}_kept``.

    Scan-shaped: pure column expressions, zero shuffle, zero Python — the
    plan is the input scan plus a projection, so it scales to any corpus
    the scan itself can handle.
    """
    s = extract_struct(F.col(html_col), min_words, max_link_density_milli)
    return bind_once_df(df, s, out_col)


def bind_once_df(df: DataFrame, s: Column, out_col: str) -> DataFrame:
    tmp = f"_{out_col}_s"
    return (
        df.withColumn(tmp, s)
        .withColumn(out_col, F.col(tmp)["text"])
        .withColumn(f"{out_col}_lines", F.col(tmp)["n_lines"])
        .withColumn(f"{out_col}_kept", F.col(tmp)["n_kept"])
        .drop(tmp)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin (same constants, RE2 side)
# ---------------------------------------------------------------------------


def _sq(pattern: str) -> str:
    return pattern.replace("'", "''")


def _dd_clean(expr: str) -> str:
    out = f"regexp_replace({expr}, '{_sq(ANY_TAG_PATTERN)}', '', 'g')"
    for ent, rep in ENTITY_MAP:
        out = f"replace({out}, '{_sq(ent)}', '{_sq(rep)}')"
    out = f"regexp_replace({out}, '{_sq(WS_CLASS)}+', ' ', 'g')"
    return f"regexp_replace({out}, '^ | $', '', 'g')"


def duckdb_line_structs_sql(expr: str) -> str:
    """DuckDB fragment: HTML expr -> list<struct(t, wc, lc)> per line —
    the oracle twin of :func:`_line_structs`."""
    vis = expr
    for pat in INVISIBLE_PATTERNS:
        vis = f"regexp_replace({vis}, '{_sq(pat)}', '', 'g')"
    lines = (
        f"string_split(regexp_replace({vis}, '{_sq(BLOCK_TAG_PATTERN)}', "
        f"chr(10), 'g'), chr(10))"
    )
    clean = _dd_clean("l")
    anchor_lens = (
        f"list_transform(regexp_extract_all(l, '{_sq(ANCHOR_PATTERN)}', 1), "
        f"a -> length({_dd_clean('a')}))"
    )
    return (
        f"list_transform({lines}, l -> struct_pack("
        f"t := {clean}, "
        f"wc := CASE WHEN length({clean}) = 0 THEN 0 "
        f"ELSE len(string_split({clean}, ' ')) END, "
        f"lc := coalesce(list_sum({anchor_lens}), 0)))"
    )


def duckdb_extract_sql(
    expr: str, min_words: int = 3, max_link_density_milli: int = 500
) -> dict[str, str]:
    """Oracle fragments over a line-struct list column named ``cs``:
    ``{"text": ..., "n_lines": ..., "n_kept": ...}`` (pair with
    :func:`duckdb_line_structs_sql` aliased AS cs in a prior CTE)."""
    keep = (
        f"s -> s.wc >= {min_words} AND "
        f"s.lc * 1000 <= {max_link_density_milli} * length(s.t)"
    )
    kept = f"list_filter({expr}, {keep})"
    return {
        # Null contract, pinned to the measured Spark behavior (ADVICE r6):
        # NULL html -> all three outputs NULL on the Spark side (size() and
        # array_join() both propagate NULL). DuckDB's len()/list_filter()
        # propagate NULL already; array_to_string does too, but its
        # empty-list result is NULL where Spark's array_join gives '' — so
        # the '' coalesce must apply ONLY when the input list is non-NULL.
        "text": (
            f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
            f"coalesce(array_to_string(list_transform({kept}, s -> s.t), chr(10)), '') END"
        ),
        "n_lines": f"len(list_filter({expr}, s -> s.wc > 0))",
        "n_kept": f"len({kept})",
    }
