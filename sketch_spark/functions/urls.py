"""URL normalization and domain rollups for web-corpus pipelines.

Crawl dedup and per-site accounting both start from a canonical URL:
case-folded scheme/host, default ports stripped, fragments dropped,
tracking parameters removed, and the surviving query parameters
sorted so parameter order doesn't split identical resources.  All of
it is Catalyst expressions (regexp extracts + array higher-order
functions) — whole-stage codegen, no UDF, no shuffle — so the
normalization rides along with the scan at corpus scale.

``registered_domain_col`` uses the last-two-labels heuristic rather
than the full public-suffix list (no bundled data files in this
sandbox); the plan shape is identical with a broadcast suffix table.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# params dropped during normalization (tracking/attribution noise)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid|mc_cid|mc_eid)="


def _col(url: str | Column) -> Column:
    return F.col(url) if isinstance(url, str) else url


def host_col(url: str | Column) -> Column:
    """Lowercased host (port stripped)."""
    c = _col(url)
    return F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))


def registered_domain_col(url: str | Column) -> Column:
    """Last two dot-labels of the host — example.com for
    www.news.example.com (public-suffix-list refinement noted above)."""
    return F.regexp_extract(host_col(url), r"([^.]+\.[^.]+)$", 1)


def normalize_url_col(url: str | Column) -> Column:
    """Canonical URL: lower(scheme)://lower(host)[path or /]?sorted
    kept-params — fragment and tracking params removed, :80/:443
    default ports stripped."""
    c = _col(url)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(F.sort_array(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def url_sql_exprs(url_expr: str) -> dict[str, str]:
    """DuckDB fragments computing exactly the three columns above."""
    scheme = f"lower(regexp_extract({url_expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host_np = f"regexp_replace({hostport}, ':(80|443)$', '')"
    host = f"lower(regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1))"
    path = f"regexp_extract({url_expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    query = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(str_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    canon_q = f"array_to_string({kept}, '&')"
    normalized = (
        f"{scheme} || '://' || {host_np} || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
        f"(CASE WHEN {canon_q} = '' THEN '' ELSE '?' || {canon_q} END)"
    )
    return {
        "host": host,
        "domain": f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)",
        "normalized": normalized,
    }
