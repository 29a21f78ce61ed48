"""Web-corpus URL queries: parse/normalize + per-domain rollup.

The fixture tables carry no URL column, so (as ``q_pii_scrub`` does
for contact strings) each document synthesizes a deterministic URL
from its stable keys — subdomain, TLD, trailing slash, query string
and fragment all vary by ``doc_id`` so every parser branch is
exercised, and both engines build the exact same strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.web import domain_stats, parse_urls
from flink_framework_spark.registry import register

# doc_id % 3 -> subdomain, % 2 -> TLD, % 5 == 0 -> trailing slash,
# % 4 -> query/fragment suffix (tracking-only / mixed / clean+fragment)
_URL_SQL = """
SELECT doc_id,
       concat(
         'https://',
         CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'cdn.' ELSE '' END,
         source, '.',
         CASE doc_id % 2 WHEN 0 THEN 'com' ELSE 'org' END,
         '/', lang, '/p', CAST(doc_id AS VARCHAR),
         CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
         CASE doc_id % 4
           WHEN 1 THEN '?utm_source=news&ref=42'
           WHEN 2 THEN '?id=7&utm_medium=email&q=x'
           WHEN 3 THEN '?a=1&b=2#sec'
           ELSE '' END) AS url
FROM documents
"""

# the DuckDB spelling of operators.web.parse_urls over those URLs
_PARSED_SQL = f"""
u AS ({_URL_SQL}),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, 'https://([^/]+)', 1)) AS host,
         regexp_extract(url, 'https://[^/]+([^?#]*)', 1) AS path,
         NULLIF(regexp_extract(url, '\\?([^#]*)', 1), '') AS query
  FROM u),
q AS (
  SELECT *,
         CASE WHEN query IS NULL THEN CAST([] AS VARCHAR[])
              ELSE string_split(query, '&') END AS params
  FROM p),
parsed AS (
  SELECT doc_id, url, host,
         regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
         path,
         CAST(len(list_filter(string_split(path, '/'), s -> s <> ''))
              AS INT) AS path_depth,
         CAST(len(params) AS INT) AS n_params,
         CAST(len(params) - len(kept) AS INT) AS n_tracking,
         concat('https://', host, regexp_replace(path, '/+$', ''),
                CASE WHEN array_to_string(kept, '&') <> ''
                     THEN concat('?', array_to_string(kept, '&'))
                     ELSE '' END) AS norm_url
  FROM (
    SELECT *,
           list_filter(params, kv ->
             NOT (starts_with(lower(string_split(kv, '=')[1]), 'utm_')
                  OR lower(string_split(kv, '=')[1])
                     IN ('fbclid', 'gclid', 'ref'))) AS kept
    FROM q) k)
"""


def _synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sub = (
        F.when(F.col("doc_id") % 3 == 0, "www.")
        .when(F.col("doc_id") % 3 == 1, "cdn.")
        .otherwise("")
    )
    tld = F.when(F.col("doc_id") % 2 == 0, "com").otherwise("org")
    tail = (
        F.when(F.col("doc_id") % 4 == 1, "?utm_source=news&ref=42")
        .when(F.col("doc_id") % 4 == 2, "?id=7&utm_medium=email&q=x")
        .when(F.col("doc_id") % 4 == 3, "?a=1&b=2#sec")
        .otherwise("")
    )
    return d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            sub,
            F.col("source"),
            F.lit("."),
            tld,
            F.lit("/"),
            F.col("lang"),
            F.lit("/p"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 5 == 0, "/").otherwise(""),
            tail,
        ).alias("url"),
    )


@register(
    "q_url_normalize",
    family="K",
    oracle=f"""
WITH {_PARSED_SQL}
SELECT * FROM parsed
""",
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition + canonicalization (`operators.web.parse_urls`):
    host/registered-domain/path-depth extraction and a normalized URL
    (lowercase host, fragment dropped, utm_*/gclid/fbclid/ref params
    stripped, trailing slash trimmed) — all Catalyst expressions
    (parse_url + higher-order filters), a pure narrow map."""
    return parse_urls(_synth_urls(spark, sf_dir))


@register(
    "q_domain_stats",
    family="K",
    oracle=f"""
WITH {_PARSED_SQL}
SELECT domain, COUNT(*) AS n_pages,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       ROUND(AVG(path_depth), 4) AS avg_depth,
       COUNT(*) FILTER (WHERE n_tracking > 0) AS n_tracked,
       CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS n_norm_urls
FROM parsed
WHERE domain NOT IN ('src19.com', 'src19.org')
GROUP BY domain
""",
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain rollup after blocklist filtering
    (`operators.web.domain_stats`): page/host counts, mean path
    depth, tracking prevalence, distinct canonical URLs. The
    blocklist drops the src19.* domains before the aggregate runs."""
    parsed = parse_urls(_synth_urls(spark, sf_dir))
    return domain_stats(parsed, blocked_domains=["src19.com", "src19.org"])
