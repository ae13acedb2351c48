"""HTML/boilerplate extraction operator (round 6): behavioral contract +
plan shape + curation-stage wiring."""

import pytest
from pyspark.sql import functions as F

from etl_file_loader_spark.operators import html as H


@pytest.fixture
def pages(spark):
    rows = [
        (
            1,
            '<html><head><title>T</title><style>p{x:1}</style>'
            '<script>if (a < b) { go("x"); }</script></head><body>'
            '<!-- hidden comment words words words words -->'
            '<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>'
            '<h1>A real heading here</h1>'
            '<p>This paragraph has enough words to survive the filter.</p>'
            '<p>Short link-light line with a <a href="/r">ref</a> stays.</p>'
            '<div class="footer"><a href="/t">Terms of Service</a> | '
            '<a href="/p">Privacy Policy</a></div></body></html>',
        ),
        (2, "plain text with no markup at all in it"),
        (3, ""),
        (4, "<p>Entities: 4 &lt; 5 &amp; it&#39;s &quot;quoted&quot;&nbsp;ok</p>"),
        (5, "<ul><li>one</li><li>two</li><li>three</li></ul>"),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


def _extract(pages):
    return {
        r["doc_id"]: (r["extracted"], r["extracted_lines"], r["extracted_kept"])
        for r in H.extract_html(pages, "html").collect()
    }


def test_boilerplate_dropped_content_kept(pages):
    out = _extract(pages)
    text, n_lines, n_kept = out[1]
    kept_lines = text.split("\n")
    # content survives
    assert "A real heading here" in kept_lines
    assert "This paragraph has enough words to survive the filter." in kept_lines
    assert "Short link-light line with a ref stays." in kept_lines
    # boilerplate (nav/footer link bars), script, style, comments are gone
    assert "Home About" not in text
    assert "Terms of Service" not in text
    assert "go(" not in text and "p{x:1}" not in text
    assert "hidden comment" not in text
    assert n_kept == 3 and n_lines > n_kept


def test_plain_text_passthrough(pages):
    out = _extract(pages)
    assert out[2] == ("plain text with no markup at all in it", 1, 1)


def test_empty_html(pages):
    out = _extract(pages)
    assert out[3] == ("", 0, 0)


def test_entity_decode(pages):
    out = _extract(pages)
    assert out[4][0] == 'Entities: 4 < 5 & it\'s "quoted" ok'


def test_short_list_items_dropped(pages):
    # one-word <li> lines fall below min_words; nothing survives
    out = _extract(pages)
    assert out[5] == ("", 3, 0)


def test_link_density_threshold(spark):
    # same words, one line mostly anchor text, one not
    df = spark.createDataFrame(
        [
            (1, '<p><a href="/x">click all of these linked words</a> now</p>'),
            (2, '<p>only the last word is <a href="/x">linked</a> here</p>'),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r["extracted"] for r in H.extract_html(df, "html").collect()}
    assert out[1] == ""  # link density ~0.86 > 0.5 -> dropped
    assert out[2] == "only the last word is linked here"


def test_scan_shaped_plan(spark):
    """The extraction plan must be a scan + projection: no exchange, no
    Python evaluation — the 100 TB contract."""
    df = spark.range(10).withColumn(
        "html",
        F.concat(F.lit("<p>a b c d "), F.col("id").cast("string"), F.lit("</p>")),
    )
    plan = H.extract_html(df, "html")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_curation_stage_flag(spark):
    from etl_file_loader_spark.plans.curation import CurationConfig, CurationPipeline

    body = "many plain words that easily pass every quality heuristic " * 5
    df = spark.createDataFrame(
        [
            (1, f'<div class="nav"><a href="/">Home</a></div><p>{body}</p>', "en"),
            (2, f"<p>{body} second doc variant</p>", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    cfg = CurationConfig(
        html_extract=True, min_quality=None, scrub_pii=False, near_dedup=False,
        shard_budget_tokens=10_000,
    )
    res = CurationPipeline(cfg).run(df)
    texts = {r["doc_id"]: r["text"] for r in res.packed.collect()}
    assert texts[1].strip() == body.strip()
    assert "Home" not in texts[1]
    assert res.stage_counts["packed"] == 2


# ---------------------------------------------------------------------------
# property-based cross-engine agreement: randomized HTML assembled from a
# component alphabet must extract IDENTICALLY in Spark and DuckDB — guards
# the regex-dialect seams (Java vs RE2) the twin depends on.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "it&#39;s", "4", "&lt;tag&gt;", "x", "Reference"]
_frag = st.one_of(
    st.sampled_from([
        "<p>", "</p>", "<div class='a'>", "</div>", "<br/>", "<li>", "</li>",
        "<a href='/x'>", "</a>", "<b>", "</b>", "<h1>", "</h1>",
        "<script>var a = 1 < 2;</script>", "<style>p{x:1}</style>",
        "<!-- c -->", "&nbsp;", "&amp;", " ", "\t", "\n",
    ]),
    st.sampled_from(_WORDS),
)
_pages = st.lists(
    st.lists(_frag, max_size=30).map("".join), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None)
@given(_pages)
def test_extraction_matches_duckdb_on_random_html(spark, pages):
    import duckdb

    df = spark.createDataFrame(list(enumerate(pages)), "doc_id long, html string")
    got = sorted(
        (r["doc_id"], r["s"]["text"], r["s"]["n_lines"], r["s"]["n_kept"])
        for r in df.select("doc_id", H.extract_struct(F.col("html")).alias("s")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", list(enumerate(pages)))
    cs = H.duckdb_line_structs_sql("html")
    frag = H.duckdb_extract_sql("cs")
    want = sorted(con.execute(
        f"WITH L AS (SELECT doc_id, {cs} AS cs FROM p) "
        f"SELECT doc_id, {frag['text']}, {frag['n_lines']}, {frag['n_kept']} FROM L"
    ).fetchall())
    assert got == want


def test_null_html_matches_duckdb(spark):
    """NULL html -> NULL text/n_lines/n_kept on BOTH engines (ADVICE r6:
    the oracle's ''-coalesce must not fire on a NULL input list)."""
    import duckdb

    df = spark.createDataFrame(
        [(0, None), (1, "<p>one two three four</p>")], "doc_id long, html string"
    )
    got = sorted(
        (r["doc_id"], r["s"]["text"], r["s"]["n_lines"], r["s"]["n_kept"])
        for r in df.select("doc_id", H.extract_struct(F.col("html")).alias("s")).collect()
    )
    assert got[0] == (0, None, None, None)
    con = duckdb.connect()
    con.execute("CREATE TABLE p(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", [(0, None), (1, "<p>one two three four</p>")])
    cs = H.duckdb_line_structs_sql("html")
    frag = H.duckdb_extract_sql("cs")
    want = sorted(con.execute(
        f"WITH L AS (SELECT doc_id, {cs} AS cs FROM p) "
        f"SELECT doc_id, {frag['text']}, {frag['n_lines']}, {frag['n_kept']} FROM L"
    ).fetchall())
    assert got == want
