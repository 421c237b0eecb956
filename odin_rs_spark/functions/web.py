"""URL / web-domain scalar functions (pure JVM-side Column
expressions — zero UDFs, whole-stage-codegen friendly at 100 TB).

These are the web-corpus hygiene primitives of large-scale LLM text
pipelines (C4, CCNet, RefinedWeb all filter and dedup BY URL before
touching text): parse → canonicalize → registered-domain, so that
"the same page fetched twice" (scheme case, default port, tracking
params, fragment, www prefix, param order) collapses to one key for
URL-level dedup, and per-domain quality/quota policies (corpus.
source_quota, corpus.source_mix) get a stable grouping key.

Scope: absolute http(s) URLs (the crawl case). Dot-segment
resolution and IDN/punycode are out of scope — crawlers emit
resolved absolute URLs (and the WARC fixture's Target-URIs are
already resolved); both are documented seams, not silent wrongness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# query parameters that do not change page identity (click-tracking)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "utm")

# two-level public suffixes the registered-domain rule must not split
# (a pragmatic embedded subset of the public-suffix list; swap in the
# full PSL as a broadcast table for production crawls)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "blogspot.com",
)


def url_parse(url: Column) -> Column:
    """Absolute URL → struct(scheme, host, port, path, query,
    fragment); empty-string captures become NULL, a non-matching
    string parses to an all-NULL struct."""
    def part(i: int) -> Column:
        s = F.regexp_extract(url, _URL_RE, i)
        return F.when(s != "", s)

    return F.struct(
        F.lower(part(1)).alias("scheme"),
        F.lower(part(2)).alias("host"),
        part(3).cast("int").alias("port"),
        part(4).alias("path"),
        part(5).alias("query"),
        part(6).alias("fragment"),
    )


def _clean_query(query: Column) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing is
    left): split on '&', drop empty params and tracking keys, sort
    for order-independence, rejoin."""
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "")
        & ~F.startswith(F.substring_index(p, "=", 1), F.lit("utm_"))
        & ~F.substring_index(p, "=", 1).isin(
            [t for t in TRACKING_PARAMS if t != "utm"]
        ),
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))


def url_canonicalize(url: Column) -> Column:
    """One canonical string per page identity: lowercase scheme/host,
    strip a leading 'www.', drop default ports (http:80, https:443),
    empty path → '/', tracking params out, remaining params sorted,
    fragment dropped. Non-URL strings canonicalize to NULL."""
    u = url_parse(url)
    scheme = u["scheme"]
    host = F.regexp_replace(u["host"], r"^www\.", "")
    default = (
        (scheme == "http") & (u["port"] == 80)
        | (scheme == "https") & (u["port"] == 443)
    )
    port = F.when(
        u["port"].isNotNull() & ~default,
        F.concat(F.lit(":"), u["port"].cast("string")),
    ).otherwise(F.lit(""))
    path = F.when(
        F.coalesce(u["path"], F.lit("")) == "", F.lit("/")
    ).otherwise(u["path"])
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port, path, _clean_query(u["query"])),
    )


def host_of(url: Column) -> Column:
    """Lowercased host with any leading 'www.' stripped."""
    return F.regexp_replace(url_parse(url)["host"], r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Registrable domain (eTLD+1) under the embedded suffix subset:
    the last 2 labels, or the last 3 when the last 2 form a two-level
    public suffix (site.example.co.uk → example.co.uk). Hosts with
    fewer labels pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    take = F.when(
        (n >= 3) & last2.isin(list(TWO_LEVEL_SUFFIXES)), F.lit(3)
    ).otherwise(F.lit(2))
    return F.when(n <= 2, host).otherwise(
        F.array_join(F.slice(labels, n - take + 1, take), ".")
    )
