"""Web-corpus URL operators: parse, normalize, per-domain rollups.

Every large-scale text pipeline keys its crawl on URLs: dedup by
normalized URL, quality/mixture decisions by registered domain,
blocklist filtering before anything expensive runs. All of it is pure
string manipulation, so the whole family stays JVM-side (``parse_url``
+ higher-order array functions — no Python in the path) and scales as
a narrow map over the corpus; the only shuffle is the per-domain
aggregate, keyed on a low-cardinality domain column (AQE handles the
head-heavy domain skew that real crawls show).

Tracking-parameter stripping follows the common public convention:
``utm_*`` (Google Analytics), ``fbclid``/``gclid`` (click ids) and
``ref`` are presentation-only and must not distinguish two URLs for
dedup purposes; the remaining params keep their original order (no
re-sorting — order is significant to many sites).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck

#: query-string keys that never distinguish page content
TRACKING_KEYS = ("fbclid", "gclid", "ref")
TRACKING_PREFIX = "utm_"


def _is_tracking(kv: Column) -> Column:
    key = F.substring_index(kv, "=", 1)
    return F.lower(key).startswith(TRACKING_PREFIX) | F.lower(key).isin(
        *TRACKING_KEYS
    )


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose and normalize a URL column.

    Adds: ``host``, ``domain`` (registered domain = last two labels),
    ``path``, ``path_depth`` (non-empty segments), ``n_params``,
    ``n_tracking`` (params stripped by normalization) and
    ``norm_url`` (lowercased host, fragment dropped, tracking params
    removed, trailing slash trimmed). Pure Catalyst expressions.
    """
    url = F.col(url_col)
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.parse_url(url, F.lit("PATH"))
    query = F.parse_url(url, F.lit("QUERY"))
    params = F.when(
        query.isNotNull() & (query != ""), F.split(query, "&")
    ).otherwise(F.array().cast("array<string>"))
    kept = F.filter(params, lambda kv: ~_is_tracking(kv))
    norm_path = F.regexp_replace(path, "/+$", "")
    norm_q = F.array_join(kept, "&")
    return df.select(
        "*",
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        path.alias("path"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != "")).alias(
            "path_depth"
        ),
        F.size(params).alias("n_params"),
        (F.size(params) - F.size(kept)).alias("n_tracking"),
        F.concat(
            F.lit("https://"),
            host,
            norm_path,
            F.when(norm_q != "", F.concat(F.lit("?"), norm_q)).otherwise(
                F.lit("")
            ),
        ).alias("norm_url"),
    )


def domain_stats(
    parsed: DataFrame, blocked_domains: Sequence[str] = ()
) -> DataFrame:
    """Per-registered-domain crawl rollup, after blocklist filtering.

    The blocklist is a tiny static set — an ``isin`` predicate (a
    broadcast-free narrow filter; a million-entry blocklist would
    become a broadcast anti-join instead, same semantics). Returns
    one row per surviving domain: page count, distinct hosts,
    mean path depth, and how many pages carried tracking params.
    """
    out = parsed
    if blocked_domains:
        out = out.filter(~F.col("domain").isin(*list(blocked_domains)))
    return out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        round_duck(F.avg("path_depth"), 4).alias("avg_depth"),
        F.count(F.when(F.col("n_tracking") > 0, 1)).alias("n_tracked"),
        F.countDistinct("norm_url").alias("n_norm_urls"),
    )
