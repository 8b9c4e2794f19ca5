"""Web-corpus hygiene: URL parsing and domain blocklist filtering.

A crawl-scale pipeline drops documents whose host matches a blocklist
(exact host or any subdomain). The blocklist is tiny (10⁴–10⁶ rows)
next to the corpus, so it BROADCASTS and the corpus never shuffles —
the filter runs in the scan stage of every executor. The host is
pulled out of the URL with one regexp (syntax shared verbatim with the
DuckDB oracle; no lookaround, so Java regex and RE2 agree).

The reference (andreypopp/sqlpp) has no web operators — this extends
the training-data-pipeline surface (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[user@]host[:port]/... -> capture group 1 = host
URL_DOMAIN_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"


def url_domain(c: Column) -> Column:
    """Host component of a URL (empty string when the regex misses —
    same convention as DuckDB's regexp_extract)."""
    return F.regexp_extract(c, URL_DOMAIN_RE, 1)


def url_domain_sql(c: str) -> str:
    return f"regexp_extract({c}, '{URL_DOMAIN_RE}', 1)"


def filter_blocked_domains(
    df: DataFrame, blocklist: DataFrame, url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose URL host equals a blocked domain OR is a
    subdomain of one (host endswith '.' + domain). Broadcast
    LEFT ANTI join — the corpus side stays in place; at 100 TB the
    blocklist ships once per executor and the filter is scan-stage."""
    host = url_domain(F.col(url_col))
    b = F.broadcast(blocklist.select(F.col(domain_col).alias("__blocked")))
    cond = (host == F.col("__blocked")) | host.endswith(
        F.concat(F.lit("."), F.col("__blocked"))
    )
    return df.join(b, on=cond, how="left_anti")
