"""Web-corpus hygiene: URL parsing and domain blocklist filtering.

A crawl-scale pipeline drops documents whose host matches a blocklist
(exact host or any subdomain). The blocklist is tiny (10⁴–10⁶ rows)
next to the corpus, so it BROADCASTS and the corpus never shuffles.

Scale design — hash anti-joins, not nested loops
------------------------------------------------
The naive formulation ``ANTI JOIN ON host = domain OR host ENDSWITH
'.'||domain`` is a non-equi condition, which Spark can only execute as
a BroadcastNestedLoopJoin: O(|blocklist|) string compares **per corpus
row** — fine at 10³ blocked domains, a scan-stage CPU wall at 10⁶.

Instead we exploit that "host is domain or a subdomain of domain" ≡
"the last L labels of host equal domain", where L is the label count
of the blocked domain. Blocklists contain only a handful of distinct
label counts (example.com → 2, sub.example.co.uk → 4), so:

    for each distinct L in the blocklist:
        corpus = corpus ANTI JOIN (broadcast blocked_L)
                 ON substring_index(host, '.', -L) = domain

Each step is a Broadcast**Hash**Join (LeftAnti) — one O(1) hash probe
per row per L, zero shuffles, corpus text never moves. The distinct-L
set is read off the blocklist at plan-build time (a count-distinct on
the small side; the blocklist is broadcast-sized by assumption).

The host is pulled out of the URL with one regexp (syntax shared
verbatim with the DuckDB oracle; no lookaround, so Java regex and RE2
agree).

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
    subdomain of one.

    One broadcast hash anti-join per distinct label count in the
    blocklist (see module docstring): each is an O(1) probe per corpus
    row, the plan contains no nested-loop or shuffle node, and the
    corpus side stays in place at any scale. The tiny
    ``count-distinct`` used to enumerate label counts runs on the
    blocklist only (broadcast-sized by assumption).
    """
    host = url_domain(F.col(url_col))
    b = blocklist.select(
        F.col(domain_col).alias("__blocked"),
        F.size(F.split(F.col(domain_col), r"\.")).alias("__nlabels"),
    )
    label_counts = sorted(
        r[0] for r in b.select("__nlabels").distinct().collect()
    )
    out = df
    for n in label_counts:
        b_n = F.broadcast(
            b.filter(F.col("__nlabels") == n).select("__blocked")
        )
        out = out.join(
            b_n,
            on=F.substring_index(host, ".", -n) == F.col("__blocked"),
            how="left_anti",
        )
    return out
