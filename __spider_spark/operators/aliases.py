"""Host-alias dimension applied inside the crawl path (P2/J3 graft form).

The reference rewrites host/airport aliases inline while building request
URLs (/root/reference/spiders/ylSpider06.py:465-468; the two-airport map
ctripSpider.py:56-70 applied at ctripSpider.py:141-146): two names for the
same logical site must collapse to ONE frontier identity, or the seen-set
and politeness budgets double-count it.

Spark-first form: the alias map is a small ``(host, canon_host)`` dimension
broadcast-joined onto frontier inserts BEFORE hashing — so ``url_hash``,
``host`` grouping, and the Bloom/seen membership all see only canonical
hosts. At web scale the alias dim (mirror lists, www-variants, CDN vanity
hosts) is O(10^6) rows — comfortably broadcastable — while the frontier is
10^10; the join is map-side only, no shuffle.

Limitations (documented, not silent): aliasing keys on the URL *host*
(no port); our canonicalizer already strips default ports, and non-default
ports keep their identity untouched.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def alias_one(url: str | None, aliases: dict[str, str] | None) -> str | None:
    """Pure scalar twin of :func:`apply_host_aliases` (shared with the
    reference simulator; the DataFrame operator is independent dataflow)."""
    if url is None or not aliases:
        return url
    parts = urlsplit(url)
    tgt = aliases.get(parts.hostname or "")
    if not tgt:
        return url
    netloc = tgt + (f":{parts.port}" if parts.port else "")
    return urlunsplit((parts.scheme, netloc, parts.path, parts.query, ""))


def aliases_df(spark: SparkSession,
               aliases: dict[str, str] | None) -> DataFrame | None:
    """Alias dimension from config (at scale: read from the lakehouse)."""
    if not aliases:
        return None
    return spark.createDataFrame(
        list(aliases.items()), "host string, canon_host string")


def apply_host_aliases(df: DataFrame,
                       alias_df: DataFrame | None) -> DataFrame:
    """Rewrite ``url``'s host through the alias dim.

    Expects a ``url`` column holding canonical URLs and a ``host`` column;
    returns df with ``url`` and ``host`` rewritten for aliased rows. Must
    run BEFORE ``url_hash`` is computed. Pure Column exprs (parse_url +
    concat) — stays in whole-stage codegen; the only non-codegen piece is
    the broadcast hash join on ``host``.
    """
    if alias_df is None:
        return df
    dim = F.broadcast(alias_df.select("host", "canon_host"))
    joined = df.join(dim, "host", "left")
    # non-default port (canonicalizer strips default ones) survives rewrite
    port = F.regexp_extract(
        F.parse_url(F.col("url"), F.lit("AUTHORITY")), r":(\d+)$", 1)
    new_url = F.concat(
        F.parse_url(F.col("url"), F.lit("PROTOCOL")), F.lit("://"),
        F.col("canon_host"),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/")),
        F.when(
            F.parse_url(F.col("url"), F.lit("QUERY")).isNotNull(),
            F.concat(F.lit("?"), F.parse_url(F.col("url"), F.lit("QUERY"))),
        ).otherwise(F.lit("")),
    )
    return (
        joined
        .withColumn(
            "url",
            F.when(F.col("canon_host").isNotNull(), new_url)
             .otherwise(F.col("url")))
        .withColumn("host", F.coalesce("canon_host", "host"))
        .drop("canon_host")
    )
