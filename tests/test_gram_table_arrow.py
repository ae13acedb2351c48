"""Arrow-vs-expression equivalence for the Gopher/text-signals family.

Optimization round 14 moved the per-doc halves of the n-gram hygiene
signals into ``mapInArrow`` passes (guide §4.2: hand whole batches to
Python instead of interpreted JVM HOF folds; §2.4: per-doc counts never
needed the groupBy(doc, n, gram) exchange). The contract is BIT-IDENTICAL
output: only integers leave Python, every fraction/round/threshold stays
in the shared expression tail, and tokenization mirrors the JVM exactly
(py_tokens: ASCII-space trim, Java-\\s ASCII-only split, kept edge-empty
tokens). These tests pin the arrow engines against the expression twins
over real corpus text plus the edge shapes that distinguish the two
tokenizer/trim/split semantics.
"""

from __future__ import annotations

import pytest

from etl_file_loader_spark.operators import text as tx
from etl_file_loader_spark.operators.cache import release_operator_caches

SF_DIR = "/root/testdata/sf0.001"

# edge shapes: NULL text, empty, ASCII-space only, tab-edged (Spark trim
# strips only 0x20, so the leading \t survives into the first token),
# newline-trailing (Java split keeps the trailing empty token), repeated
# multi-space runs, duplicate lines/paras, unicode NBSP (NOT a Java \s
# separator), long repetitive docs that exercise every n = 2..10 slice
EDGE_ROWS = [
    (100001, None),
    (100002, ""),
    (100003, "   "),
    (100004, "\ta b\n"),
    (100005, "a b c  d"),
    (100006, "x\n\ny y\nz\nz\n\n\nx"),
    (100007, "w1 w2 w1 w2 w1 w2 w1 w2 w1 w2 w1 w2"),
    (100008, "a\xa0b c a\xa0b c"),
    (100009, "one two three four five six seven eight nine ten eleven"),
    (100010, "r s t u v w x y z a r s t u v w x y z a r s t u v w x y z a"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")
    return docs.unionByName(edge)


def _rows(df):
    out = sorted(tuple(r) for r in df.collect())
    release_operator_caches()
    return out


def test_gram_count_table_engines_identical(corpus):
    ns = range(2, 11)
    pos = set(range(5, 11))
    a = tx._gram_count_table(corpus, "doc_id", "text", ns, pos_ns=pos,
                             engine="arrow")
    e = tx._gram_count_table(corpus, "doc_id", "text", ns, pos_ns=pos,
                             engine="explode")
    # _poss order is unconstrained (collect_list arrival order on the
    # explode side) — compare as multisets per row
    norm = lambda rows: sorted(  # noqa: E731
        (r[0], r[1], r[2], r[3], tuple(sorted(r[4]))) for r in rows
    )
    ra, re_ = norm(a.collect()), norm(e.collect())
    assert len(ra) > 100_000  # real corpus, not a toy frame
    assert ra == re_


def test_gopher_repetition_engines_identical(corpus):
    a = _rows(tx.gopher_repetition(corpus, "doc_id", "text", engine="arrow"))
    e = _rows(tx.gopher_repetition(corpus, "doc_id", "text", engine="explode"))
    assert a == e  # doubles included: same ints through the same exprs


def test_text_signals_engines_identical(corpus):
    from pyspark.sql import functions as F

    bench = corpus.filter(
        (F.col("doc_id") < 20) | (F.col("doc_id") >= 100001)
    )
    a = _rows(tx.text_signals(corpus, "doc_id", "text", benchmark=bench,
                              engine="arrow"))
    e = _rows(tx.text_signals(corpus, "doc_id", "text", benchmark=bench,
                              engine="explode"))
    assert a == e  # includes cleaned_md5: span accounting bit-identical


def test_unknown_engine_raises(corpus):
    with pytest.raises(ValueError, match="engine"):
        tx.gopher_repetition(corpus, "doc_id", "text", engine="bogus")
    with pytest.raises(ValueError, match="engine"):
        tx.text_signals(corpus, "doc_id", "text", engine="bogus")
    with pytest.raises(ValueError, match="engine"):
        tx._gram_count_table(corpus, "doc_id", "text", range(2, 4),
                             engine="bogus")
