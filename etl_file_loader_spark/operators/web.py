"""Web-corpus URL operators: parse, canonicalize, group and police by domain.

The curation stages every crawl-derived corpus (Common-Crawl-style) runs
BEFORE text-level dedup, because they are orders of magnitude cheaper per
byte and remove whole swaths of the corpus:

- ``url_parse`` / ``url_normalize``: canonical URL form so that
  ``https://WWW.Example.COM:443/a?utm_source=x&id=1#frag`` and
  ``https://www.example.com/a?id=1`` collapse to one exact-dedup key.
- ``registrable_domain``: eTLD+1 grouping key (heuristic public-suffix
  subset — see ``_SECOND_LEVEL_TLDS``), the unit at which crawl pipelines
  apply reputation, caps, and blocklists.
- ``domain_stats`` / ``domain_cap`` / ``blocklist_filter``: per-domain
  rollup, per-domain document caps (no single domain may dominate the
  training mix), and broadcast anti-join against a blocked-domain list.

Everything is pure Column expressions (regexp/split/filter/concat) —
JVM-side, whole-stage-codegen, exactly replayable in ANSI SQL, which is
how the suite oracles value-check the full canonicalization
(suite/web.py). At 100 TB: parsing/normalizing is a narrow projection;
``domain_cap`` is one window over the domain key (shuffle on domain —
bounded cardinality); ``blocklist_filter`` broadcasts the list.

Scope notes (documented, deliberate): percent-encoding is NOT decoded and
query-parameter order is preserved (only tracking params are dropped) —
both decisions keep the transform bijective on the retained content;
IDN/punycode hosts pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# RFC-3986-ish URL shape; group numbers used by url_parse/_normalize.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# Heuristic public-suffix subset: second-level suffixes under which the
# registrable domain needs THREE labels (bbc.co.uk, not co.uk). A static
# expression-friendly subset of the Mozilla public-suffix list's by far
# most common entries; extend as corpus demographics require.
_SECOND_LEVEL_TLDS = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "com.my", "com.vn", "com.ph", "com.eg", "com.sa", "com.ng",
    "com.pk", "com.bd",
    "co.in", "net.in", "org.in", "co.za", "co.kr", "or.kr",
    "co.id", "co.th", "co.il", "co.ke",
]

# default tracking parameters to strip during normalization
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_NAMES = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid")


def url_parse(url: Column) -> Column:
    """Parse a URL into a struct(scheme, host, port, path, query, fragment).

    Pure regexp_extract projections — missing pieces come back as empty
    strings (port as null long), matching what the SQL replay yields.
    """
    return F.struct(
        F.lower(F.regexp_extract(url, _URL_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(url, _URL_RE, 2)).alias("host"),
        F.nullif(F.regexp_extract(url, _URL_RE, 3), F.lit("")).cast("long").alias("port"),
        F.regexp_extract(url, _URL_RE, 4).alias("path"),
        F.regexp_extract(url, _URL_RE, 5).alias("query"),
        F.regexp_extract(url, _URL_RE, 6).alias("fragment"),
    )


def _kept_query(query: Column) -> Column:
    """Drop tracking parameters, preserving the order of the rest."""
    name_re = "^(" + "|".join(_TRACKING_NAMES) + ")="
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.startswith(_TRACKING_PREFIXES[0]) & ~p.rlike(name_re),
    )
    return F.array_join(kept, "&")


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped
    (80/http, 443/https), fragment dropped, tracking params removed,
    empty path -> '/', empty query -> no '?'."""
    scheme = F.lower(F.regexp_extract(url, _URL_RE, 1))
    host = F.lower(F.regexp_extract(url, _URL_RE, 2))
    port = F.regexp_extract(url, _URL_RE, 3)
    path = F.regexp_extract(url, _URL_RE, 4)
    query = F.regexp_extract(url, _URL_RE, 5)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    q = F.when(query == "", F.lit("")).otherwise(_kept_query(query))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the _SECOND_LEVEL_TLDS heuristic: three labels when
    the last two form a known second-level suffix, else two."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1))
    last3 = F.concat(F.element_at(labels, -3), F.lit("."), last2)
    in_sl = last2.isin(*_SECOND_LEVEL_TLDS)
    return (
        F.when(n <= 2, host)
        .when(in_sl & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_stats(df: DataFrame, url_col: str, chars_col: str | None = None) -> DataFrame:
    """Per-registrable-domain rollup: document count (+ total/avg chars
    when ``chars_col`` given) — the reputation/cap-decision input. One
    combinable aggregation keyed on a bounded-cardinality domain key."""
    host = F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 2))
    base = df.withColumn("_domain", registrable_domain(host))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if chars_col:
        aggs += [
            F.sum(chars_col).cast("long").alias("total_chars"),
            F.round(F.avg(chars_col), 2).alias("avg_chars"),
        ]
    return base.groupBy(F.col("_domain").alias("domain")).agg(*aggs)


def domain_cap(
    df: DataFrame, url_col: str, max_per_domain: int, order_col: str
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registrable domain,
    deterministically (the ``order_col`` ascending picks survivors) — the
    standard anti-dominance guard on crawl corpora. One window over the
    domain key; at 100 TB the shuffle is on the (bounded) domain
    cardinality, and skewed mega-domains are exactly the rows the cap
    discards, so task output stays bounded even where input is skewed."""
    host = F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 2))
    base = df.withColumn("_domain", registrable_domain(host))
    w = Window.partitionBy("_domain").orderBy(F.col(order_col).asc())
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_domain)
        .drop("_rn")
        .withColumnRenamed("_domain", "domain")
    )


def blocklist_filter(
    df: DataFrame, url_col: str, blocked_domains: DataFrame
) -> DataFrame:
    """Anti-join the corpus against a blocked registrable-domain list
    (column ``domain``). The list is tiny relative to the corpus —
    broadcast explicitly so 1000 executors each prune locally."""
    host = F.lower(F.regexp_extract(F.col(url_col), _URL_RE, 2))
    base = df.withColumn("_domain", registrable_domain(host))
    return (
        base.join(
            F.broadcast(blocked_domains.select(F.col("domain").alias("_domain"))),
            "_domain",
            "left_anti",
        )
        .withColumnRenamed("_domain", "domain")
    )
