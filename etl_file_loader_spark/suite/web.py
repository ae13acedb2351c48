"""Web-corpus URL operator rows: canonicalization + domain policing.

The documents table carries no URL column, so both engines derive the
SAME synthetic URL from doc_id/source with pure expressions (the planted-
feed precedent): md5-keyed hosts over 23 registrable domains spanning
plain and second-level TLDs, uppercase scheme/host variants, default and
non-default ports, tracking params, fragments, and query-less URLs — one
branch per normalization rule, so the oracle exercises every CASE in
operators/web.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_file_loader_spark.operators import web as web_ops
from etl_file_loader_spark.suite._shared import ORACLES, QUERIES, _t


def _synthetic_url(doc_id: Column, source: Column) -> Column:
    """Deterministic URL exercising every normalization branch. The SQL
    twin is _URL_DERIVE_SQL — keep the two in lockstep."""
    d = doc_id.cast("long")
    base = F.substring(F.md5((d % 23).cast("string")), 1, 6)
    tld = (
        F.when(d % 4 == 0, ".com")
        .when(d % 4 == 1, ".co.uk")
        .when(d % 4 == 2, ".org")
        .otherwise(".com.au")
    )
    hostpfx = F.when(d % 2 == 0, "WWW.").otherwise("sub.")
    scheme = F.when(d % 3 == 0, "HTTPS").otherwise("https")
    port = (
        F.when(d % 5 == 0, ":8080").when(d % 5 == 1, ":443").otherwise("")
    )
    path = F.concat(F.lit("/"), source, F.lit("/"), d.cast("string"))
    query = F.when(
        d % 2 == 0,
        F.concat(F.lit("utm_source=feed&id="), d.cast("string"), F.lit("&utm_campaign=x")),
    ).otherwise(F.concat(F.lit("id="), d.cast("string"), F.lit("&fbclid=abc")))
    frag = F.when(d % 4 == 0, "#frag").otherwise("")
    tail = F.when(d % 11 == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), query, frag)
    )
    return F.concat(scheme, F.lit("://"), hostpfx, base, tld, port, path, tail)


# SQL twin of _synthetic_url (DuckDB): applied to the documents view.
_URL_DERIVE_SQL = """
  CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END || '://'
  || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'sub.' END
  || substr(md5(CAST(doc_id % 23 AS VARCHAR)), 1, 6)
  || CASE WHEN doc_id % 4 = 0 THEN '.com'
          WHEN doc_id % 4 = 1 THEN '.co.uk'
          WHEN doc_id % 4 = 2 THEN '.org'
          ELSE '.com.au' END
  || CASE WHEN doc_id % 5 = 0 THEN ':8080'
          WHEN doc_id % 5 = 1 THEN ':443'
          ELSE '' END
  || '/' || source || '/' || CAST(doc_id AS VARCHAR)
  || CASE WHEN doc_id % 11 = 0 THEN ''
          ELSE '?'
            || CASE WHEN doc_id % 2 = 0
                    THEN 'utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
                    ELSE 'id=' || CAST(doc_id AS VARCHAR) || '&fbclid=abc' END
            || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END
          END
"""

_TRACK_FILTER_SQL = (
    "array_to_string(list_filter(string_split({q}, '&'), "
    "x -> NOT starts_with(x, 'utm_') AND NOT regexp_matches(x, "
    "'^(fbclid|gclid|msclkid|mc_eid|igshid)(=|$)')), '&')"
)

_SL_TLDS_SQL = ", ".join(f"'{t}'" for t in web_ops._SECOND_LEVEL_TLDS)

_REG_DOMAIN_SQL = """
  CASE WHEN len(string_split({h}, '.')) <= 2 THEN {h}
       WHEN string_split({h}, '.')[-2] || '.' || string_split({h}, '.')[-1]
              IN ({tlds})
            AND len(string_split({h}, '.')) >= 3
       THEN string_split({h}, '.')[-3] || '.'
            || string_split({h}, '.')[-2] || '.' || string_split({h}, '.')[-1]
       ELSE string_split({h}, '.')[-2] || '.' || string_split({h}, '.')[-1]
  END
"""


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-value canonicalization check: parse + normalize + registrable
    domain over every synthetic URL (operators/web.py:url_parse /
    url_normalize / registrable_domain)."""
    docs = _t(spark, sf_dir, "documents")
    url = _synthetic_url(F.col("doc_id"), F.col("source"))
    parsed = web_ops.url_parse(url)
    return docs.select(
        "doc_id",
        web_ops.url_normalize(url).alias("url_norm"),
        parsed.getField("scheme").alias("scheme"),
        parsed.getField("host").alias("host"),
        parsed.getField("port").alias("port"),
        parsed.getField("path").alias("path"),
        web_ops.registrable_domain(parsed.getField("host")).alias("domain"),
    )


_URL_PARTS_CTE = f"""
u AS (
  SELECT doc_id, {_URL_DERIVE_SQL} AS url FROM documents
),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '{web_ops._URL_RE}', 1)) AS scheme,
         lower(regexp_extract(url, '{web_ops._URL_RE}', 2)) AS host,
         regexp_extract(url, '{web_ops._URL_RE}', 3) AS port_s,
         regexp_extract(url, '{web_ops._URL_RE}', 4) AS path,
         regexp_extract(url, '{web_ops._URL_RE}', 5) AS query
  FROM u
)"""


Q_URL_CANONICAL_SQL = f"""
WITH {_URL_PARTS_CTE}
SELECT doc_id,
       scheme || '://' || host
       || CASE WHEN port_s <> ''
                AND NOT (scheme = 'http' AND port_s = '80')
                AND NOT (scheme = 'https' AND port_s = '443')
               THEN ':' || port_s ELSE '' END
       || CASE WHEN path = '' THEN '/' ELSE path END
       || CASE WHEN query = '' THEN ''
               WHEN {_TRACK_FILTER_SQL.format(q="query")} = '' THEN ''
               ELSE '?' || {_TRACK_FILTER_SQL.format(q="query")} END
         AS url_norm,
       scheme, host,
       CAST(nullif(port_s, '') AS BIGINT) AS port,
       path,
       {_REG_DOMAIN_SQL.format(h="host", tlds=_SL_TLDS_SQL)} AS domain
FROM p
"""


def q_domain_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain policing end-to-end: blocklist anti-join (domains whose
    md5-derived host base starts with 'a'..'c' — derived from the corpus
    itself so both engines build the same list), then a per-domain cap of
    5 by doc_id, then the per-domain rollup (operators/web.py:
    blocklist_filter / domain_cap / domain_stats shapes)."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "url", _synthetic_url(F.col("doc_id"), F.col("source"))
    )
    parsed = web_ops.url_parse(F.col("url"))
    with_domain = docs.withColumn(
        "domain", web_ops.registrable_domain(parsed.getField("host"))
    )
    blocked = (
        with_domain.select("domain")
        .distinct()
        .filter(F.substring("domain", 1, 1).between("a", "c"))
    )
    kept = web_ops.blocklist_filter(docs, "url", blocked)
    capped = web_ops.domain_cap(kept.drop("domain"), "url", 5, "doc_id")
    return capped.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


Q_DOMAIN_GUARD_SQL = f"""
WITH {_URL_PARTS_CTE},
d AS (
  SELECT doc_id,
         {_REG_DOMAIN_SQL.format(h="host", tlds=_SL_TLDS_SQL)} AS domain
  FROM p
),
blocked AS (
  SELECT DISTINCT domain FROM d
  WHERE substr(domain, 1, 1) BETWEEN 'a' AND 'c'
),
kept AS (
  SELECT d.* FROM d ANTI JOIN blocked b USING (domain)
),
capped AS (
  SELECT doc_id, domain FROM (
    SELECT doc_id, domain,
           row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
    FROM kept) WHERE rn <= 5
)
SELECT domain,
       CAST(count(*) AS BIGINT) AS n_kept,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc
FROM capped GROUP BY domain
"""


QUERIES.update(
    {
        "url_canonical": q_url_canonical,
        "domain_guard": q_domain_guard,
    }
)
ORACLES.update(
    {
        "url_canonical": Q_URL_CANONICAL_SQL,
        "domain_guard": Q_DOMAIN_GUARD_SQL,
    }
)
