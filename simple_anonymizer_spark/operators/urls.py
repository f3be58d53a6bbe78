"""URL parsing, canonicalization, and domain statistics — the crawl-
metadata half of web-corpus curation (next to ``sources/warc.py`` and
``textprep.extract_html_text``): URL-keyed dedup, per-domain quota caps
(``sampling.per_group_cap``), and domain-mix audits all need one
canonical URL form and one registered-domain key.

Everything is native column algebra (map-only, whole-stage codegen):
parsing is the RFC 3986 Appendix B reference regex (identical groups in
Java regex and RE2), canonicalization rebuilds the URL from typed parts
(lowercased scheme/host, default port dropped, fragment dropped,
tracking parameters removed, query keys sorted — the
crawler-deduplication canonical form), and the registered domain is a
last-N-labels rule against an embedded second-level public-suffix set
(the PSL head — the full list is a data file, not an algorithm; the
subset covers the common ccTLD second levels and is part of the
determinism spec like ``functions/data_lists.py``).

Scale: zero shuffles for parse/normalize (pure projection fused into
the scan); ``url_domain_stats`` is one hash aggregation on the domain
key. Skewed domains (a crawl's top host can be 1e8 URLs) are exactly
why the group key is the REGISTERED domain, bounded by the web's domain
count, not the URL or host — and the agg is all-combinable (map-side
partials), so skew costs one hot reducer at worst, never a replan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: RFC 3986 Appendix B — the spec's own parsing regex, verbatim.
#: Groups: 2=scheme, 4=authority, 5=path, 7=query, 9=fragment.
URI_PATTERN = r"^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?"

#: Tracking parameters every crawler strips before URL dedup.
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_eid)(=.*)?$"

#: Second-level public suffixes (PSL head): hosts ending in one of
#: these keep THREE labels as the registered domain, otherwise two.
#: Frozen like data_lists.py — order and contents are part of the spec.
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "ac.uk", "co.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "com.br", "com.mx",
    "com.cn", "com.tr", "co.za", "com.ar", "com.sg", "co.kr",
)


#: Synthesized-URL template for the driver gates (`url_parse_docs`,
#: `url_domain_stats`): both engines build the SAME three URL shapes
#: from (doc_id % 3, source, doc_id) — uppercase scheme/host with a
#: default port + tracking junk + fragment (canonicalization case), a
#: co.uk host with a NON-default port (PSL + port-keep case), and a
#: bare host with no path (root-path case). One source of truth.
URL_DEMO_SEGMENTS: dict[int, tuple[str, str, str]] = {
    0: ("HTTP://WWW.", ".Example.COM:80/Articles/",
        "/?utm_source=feed&b=2&a=1#frag"),
    1: ("https://blog.", ".co.uk:8080/post/", "?id=9&gclid=xyz"),
    2: ("https://CDN.", ".io?v=", ""),
}


def url_scheme(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, URI_PATTERN, 2))


def url_host(url: Column | str) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    c = F.col(url) if isinstance(url, str) else url
    auth = F.regexp_extract(c, URI_PATTERN, 4)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def url_port(url: Column | str) -> Column:
    """Explicit port as a long, NULL when absent."""
    c = F.col(url) if isinstance(url, str) else url
    auth = F.element_at(
        F.split(F.regexp_extract(c, URI_PATTERN, 4), "@"), -1)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    return F.when(port != "", port.cast("long"))


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, URI_PATTERN, 5)


def url_query(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, URI_PATTERN, 7)


def registered_domain(host: Column | str) -> Column:
    """Last-two-labels registered domain, or last-three when the host
    ends in an embedded second-level public suffix (co.uk family)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    last3 = F.array_join(F.slice(labels, n - 2, 3), ".")
    is_2ld = last2.isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when(n <= 2, h)
        .when((n >= 3) & is_2ld, last3)
        .otherwise(last2)
    )


def normalize_url(url: Column | str) -> Column:
    """Crawler-canonical URL: lowercase scheme and host, default port
    dropped (80 for http, 443 for https), fragment dropped, tracking
    parameters removed, surviving query parameters sorted. The result
    is the URL-dedup key; two fetches of the same resource with
    different tracking junk canonicalize identically."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = url_scheme(c)
    host = url_host(c)
    port = url_port(c)
    keep_port = port.isNotNull() & ~(
        ((scheme == "http") & (port == 80))
        | ((scheme == "https") & (port == 443))
    )
    params = F.filter(
        F.split(url_query(c), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    query = F.array_join(F.array_sort(params), "&")
    path = url_path(c)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port.cast("string")))
        .otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def parse_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-URL typed breakdown + canonical form + registered domain —
    the projection a crawl frontier or URL-dedup stage runs first."""
    u = F.col(url_col)
    host = url_host(u)
    path = url_path(u)
    return df.select(
        F.col(id_col),
        url_scheme(u).alias("scheme"),
        host.alias("host"),
        registered_domain(host).alias("domain"),
        path.alias("path"),
        F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
        .cast("long").alias("path_depth"),
        normalize_url(u).alias("url_canonical"),
    )


def url_domain_stats(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-registered-domain crawl census: URL and distinct-host
    counts, https share's exact numerator, distinct canonical URLs
    (the post-dedup size), and mean path depth as one division of
    exact integer sums. One hash aggregation on the bounded domain
    key; everything upstream is a fused projection."""
    u = F.col(url_col)
    host = url_host(u)
    parsed = df.select(
        registered_domain(host).alias("domain"),
        host.alias("host"),
        url_scheme(u).alias("scheme"),
        normalize_url(u).alias("canon"),
        F.size(F.filter(F.split(url_path(u), "/"), lambda s: s != ""))
        .cast("long").alias("depth"),
    )
    return (
        parsed.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.countDistinct("canon").cast("long").alias("n_canonical"),
            F.sum(F.when(F.col("scheme") == "https", 1).otherwise(0))
            .cast("long").alias("n_https"),
            (F.sum("depth").cast("double") / F.count(F.lit(1)).cast("double"))
            .alias("avg_path_depth"),
        )
    )
