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
resolution (RFC 3986 §5.2.4) and percent-encoding normalization
(§6.2.2.1-2: decode unreserved octets, uppercase the rest) are
IN scope since r8 — both pure column math. IDN/punycode stays out
(a host that needs it canonicalizes byte-stable but not
IDN-equivalent; documented seam, not silent wrongness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# userinfo ("user:pass@") is consumed by a non-capturing group so the
# host capture never stops at the ':' of a password (ADVICE r7: the
# old pattern parsed host='user' for userinfo URLs)
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://(?:[^/?#@]*@)?([^/?#:@]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# query parameters that do not change page identity (click-tracking).
# Deliberately NOT 'ref' (ADVICE r7: content-bearing on common crawl
# targets — GitHub '?ref=branch' selects different page content);
# recipe owners tune the list per corpus via the `tracking` parameter
# of url_canonicalize.
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "utm")

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


def _clean_query(
    query: Column, tracking: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing is
    left): split on '&', drop empty params and tracking keys ('utm'
    in the list means the utm_* prefix family), sort for
    order-independence, rejoin."""
    exact = [t for t in tracking if t != "utm"]
    drop_utm = "utm" in tracking

    def keep(p: Column) -> Column:
        k = F.substring_index(p, "=", 1)
        cond = (p != "") & ~k.isin(exact)
        if drop_utm:
            cond = cond & ~F.startswith(k, F.lit("utm_"))
        return cond

    # §6.2.2 percent-encoding normalization applies to the query too
    # (ADVICE r8: '?q=%7Ex' and '?q=~x' are one page identity); '%26'
    # is reserved so an encoded '&' cannot split into a ghost param
    params = F.filter(
        F.split(pct_normalize(F.coalesce(query, F.lit(""))), "&"), keep
    )
    return F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))


# RFC 3986 §2.3 unreserved characters: percent-triplets encoding
# these decode to the bare character; every other triplet normalizes
# to uppercase hex (§6.2.2.1). ALPHA / DIGIT / '-' '.' '_' '~'.
def _is_unreserved(cp: Column) -> Column:
    return (
        cp.between(48, 57)   # 0-9
        | cp.between(65, 90)  # A-Z
        | cp.between(97, 122)  # a-z
        | cp.isin(45, 46, 95, 126)  # - . _ ~
    )


def pct_normalize(c: Column) -> Column:
    """Percent-encoding normalization (RFC 3986 §6.2.2): every %xx
    triplet encoding an UNRESERVED character decodes to that
    character; all other triplets uppercase their hex digits
    (%7e → ~, %3a → %3A). Pure column math: extract the distinct
    triplets, map each to its replacement, fold replace() over them —
    zero UDFs, cost proportional to the (tiny) distinct-triplet set
    per value."""
    toks = F.array_distinct(
        F.regexp_extract_all(c, F.lit("%[0-9A-Fa-f]{2}"), 0)
    )

    def rep(t: Column) -> Column:
        cp = F.conv(F.substring(t, 2, 2), 16, 10).cast("int")
        return F.when(_is_unreserved(cp), F.char(cp)).otherwise(F.upper(t))

    return F.aggregate(toks, c, lambda acc, t: F.replace(acc, t, rep(t)))


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 remove_dot_segments on an absolute path, as a
    single fold: '.' segments drop, '..' pops, a trailing '.' or '..'
    leaves the trailing slash ('/a/.' → '/a/', '/a/..' → '/').
    NULL-safe (NULL in → NULL out); non-absolute strings pass
    through unchanged (crawl paths are always absolute)."""
    # a trailing '/.' or '/..' acts like '/./' / '/../' (RFC: the
    # output buffer keeps the slash) — append the slash up front so
    # every dot segment is non-final and the fold stays one pass
    p = F.when(path.rlike(r"/\.\.?$"), F.concat(path, F.lit("/"))).otherwise(
        path
    )
    segs = F.split(F.substring(p, 2, F.lit(2147483647)), "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    return F.when(
        path.startswith("/"), F.concat(F.lit("/"), F.array_join(stack, "/"))
    ).otherwise(path)


def url_canonicalize(
    url: Column, tracking: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """One canonical string per page identity: lowercase scheme/host,
    strip a leading 'www.', drop default ports (http:80, https:443),
    empty path → '/', percent-encoding normalized then dot-segments
    resolved in the path (RFC 3986 §6.2.2 order: decode unreserved
    octets before removing dot segments), tracking params out
    (tunable via `tracking`), remaining params sorted, fragment
    dropped. Non-URL strings canonicalize to NULL."""
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
    ).otherwise(remove_dot_segments(pct_normalize(u["path"])))
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            port,
            path,
            _clean_query(u["query"], tracking),
        ),
    )


def host_of(url: Column) -> Column:
    """Lowercased host with any leading 'www.' stripped."""
    return F.regexp_replace(url_parse(url)["host"], r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """Registrable domain (eTLD+1) under the embedded suffix subset —
    the zero-join CLOSED-FORM fallback: the last 2 labels, or the
    last 3 when the last 2 form a two-level public suffix
    (site.example.co.uk → example.co.uk). Hosts with fewer labels
    pass through unchanged. For the full Public Suffix List semantics
    (wildcard and exception rules, arbitrary-depth suffixes) use
    `registered_domain_psl` with a PSL dim table (`load_psl`)."""
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


# ---------------------------------------------------------------------------
# Full Public Suffix List semantics (VERDICT r7 #5): the PSL as a
# broadcast dim table instead of the embedded two-level subset. Rules
# follow publicsuffix.org's algorithm: among matching rules an
# exception ('!') wins outright, else the longest (most labels) rule;
# a '*.' rule matches exactly one extra label; no match falls back to
# the implicit '*' default (the bare TLD is the public suffix). The
# registrable domain is the public suffix plus one label.
# ---------------------------------------------------------------------------

PSL_FIXTURE = "public_suffix_trimmed.dat"

# session → {(path, mtime_ns, size): DataFrame} — the parsed PSL dim's
# logical plan, memoized like sources.tables.load_table: the driver-side
# parse + createDataFrame of ~14k rules costs ~0.25 s and several query
# builders call it per bench/oracle run. Plan reuse only — the
# LocalRelation holds the parsed rules (a static dim file), and a
# changed file or new session rebuilds.
import weakref as _weakref

_PSL_MEMO: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def load_psl(spark, path: str | None = None):
    """Parse a Public Suffix List file (the list's own format) into a
    rules dim table (key, ps_labels, is_exc, is_wild): `key` is the
    literal label-suffix the rule joins on (wildcards join on the
    MATCHED SUFFIX'S PARENT, so their key drops the '*.'), and
    `ps_labels` is the public-suffix label count the rule grants.
    Driver-side parse of a dim file — the PSL is ~14k tiny lines, the
    same economics as any broadcast dimension."""
    import os as _os

    if path is None:
        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "fixtures",
            PSL_FIXTURE,
        )
    st = _os.stat(path)
    memo = _PSL_MEMO.setdefault(spark, {})
    memo_key = (_os.path.abspath(path), st.st_mtime_ns, st.st_size)
    cached = memo.get(memo_key)
    if cached is not None:
        return cached
    rows = []
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip().lower()
            if not line or line.startswith("//"):
                continue
            is_exc = line.startswith("!")
            is_wild = line.startswith("*.")
            key = line.lstrip("!")
            if is_wild:
                key = key[2:]
            n_key = key.count(".") + 1
            if is_exc:
                ps = n_key - 1  # the exception itself is registrable
            elif is_wild:
                ps = n_key + 1  # one extra label joins the suffix
            else:
                ps = n_key
            rows.append((key, ps, int(is_exc), int(is_wild)))
    df = spark.createDataFrame(
        rows, "key string, ps_labels int, is_exc int, is_wild int"
    )
    memo[memo_key] = df
    return df


def registered_domain_psl(
    df, psl, host_col: str = "host", out_col: str = "domain"
):
    """Add the PSL-correct registrable domain (eTLD+1) to `df`.

    Scale shape: run this on the DISTINCT-host dim of a corpus (hosts
    number ~10^7 where pages number ~10^11), then broadcast the result
    back onto the pages. Each host explodes into ≤2L match candidates
    (suffix of i labels for plain/exception rules; that suffix's
    parent for single-label wildcards — L is tiny), ONE broadcast
    left equi-join on (key, kind) resolves both rule kinds, and one
    groupBy on an injected row id picks the winner — struct-max
    ordering puts exceptions above longest-match, exactly the
    publicsuffix.org precedence. Hosts that ARE a public suffix (or
    bare TLDs) pass through unchanged.

    Plan-shape note: the row-id frame feeds exactly ONE lineage
    (explode → join → groupBy, no join-back) — referencing a
    monotonically_increasing_id frame from two plan branches is
    evaluation-order-dependent when the input sits downstream of a
    shuffle (the q183 bug class), so this operator, like
    robots_allowed, carries its payload columns THROUGH the groupBy
    instead of re-joining them."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("__rid", F.monotonically_increasing_id())
    labels = F.split(F.col(host_col), r"\.")
    L = F.size(labels)
    # per suffix level i: (sfx, kind=0) targets plain/exception rules
    # and (parent, kind=1) targets wildcard rules — one equi-key space
    cand = keyed.select(
        *df.columns,
        "__rid",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), L),
                    lambda i: F.array(
                        F.struct(
                            F.array_join(
                                F.slice(labels, L - i + 1, i), "."
                            ).alias("mkey"),
                            F.lit(0).alias("kind"),
                        ),
                        F.struct(
                            F.when(
                                i >= 2,
                                F.array_join(
                                    F.slice(labels, L - i + 2, i - 1), "."
                                ),
                            ).alias("mkey"),
                            F.lit(1).alias("kind"),
                        ),
                    ),
                )
            )
        ).alias("c"),
    )
    matched = cand.join(
        F.broadcast(psl),
        (cand["c.mkey"] == psl["key"]) & (cand["c.kind"] == psl["is_wild"]),
        "left",
    )
    agg = matched.groupBy("__rid").agg(
        *[F.first(c).alias(c) for c in df.columns],
        F.max(
            F.when(
                F.col("ps_labels").isNotNull(),
                F.struct(F.col("is_exc"), F.col("ps_labels")),
            )
        ).alias("__best"),
    )
    labels2 = F.split(F.col(host_col), r"\.")
    n = F.size(labels2)
    ps = F.coalesce(F.col("__best.ps_labels"), F.lit(1))  # implicit '*'
    dom = F.when(
        n > ps, F.array_join(F.slice(labels2, n - ps, ps + 1), ".")
    ).otherwise(F.col(host_col))
    return agg.select(*df.columns, dom.alias(out_col))


def url_resolve(base: Column, ref: Column) -> Column:
    """RFC 3986 §5.2 relative-reference resolution as pure column
    math — the crawler primitive that turns an HTML outlink into a
    frontier URL (real pages link relatively far more often than
    absolutely). Handles the five reference shapes:

    - absolute ('https://x/…')       → the reference itself
    - network-path ('//host/p')      → base scheme + reference
    - absolute-path ('/p')           → base authority + path
    - relative path ('p', '../p')    → merged with the base path's
      directory, then remove_dot_segments
    - query/fragment-only ('?q','#f')→ base path; '?q' replaces the
      query, while '' / '#f' KEEP the base query (§5.3: T.query =
      Base.query when the reference supplies none — '#frag' on
      'page.html?x=1' is still page.html?x=1). Fragments never
      survive (crawl identity ignores them)

    Scope matches url_parse (http(s), no IDN); a NULL/unparseable
    base yields NULL."""
    b = url_parse(base)
    scheme = b["scheme"]
    authority = F.concat(
        scheme,
        F.lit("://"),
        b["host"],
        F.when(
            b["port"].isNotNull(),
            F.concat(F.lit(":"), b["port"].cast("string")),
        ).otherwise(F.lit("")),
    )
    bpath = F.when(
        F.coalesce(b["path"], F.lit("")) == "", F.lit("/")
    ).otherwise(b["path"])
    bquery = F.when(
        b["query"].isNotNull(), F.concat(F.lit("?"), b["query"])
    ).otherwise(F.lit(""))
    # reference parts (path / ?query — fragment dropped)
    rpath = F.regexp_extract(ref, r"^([^?#]*)", 1)
    rq = F.regexp_extract(ref, r"\?([^#]*)", 1)
    rquery = F.when(rq != "", F.concat(F.lit("?"), rq)).otherwise(F.lit(""))
    # base path's directory (everything up to the last '/')
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    merged = remove_dot_segments(F.concat(bdir, rpath))
    abs_path = remove_dot_segments(rpath)
    resolved = (
        F.when(ref.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        .when(ref.startswith("/"), F.concat(authority, abs_path, rquery))
        .when(
            ref.startswith("?"),
            F.concat(authority, bpath, rquery),
        )
        .when(
            (ref == "") | ref.startswith("#"),
            F.concat(authority, bpath, bquery),
        )
        .otherwise(F.concat(authority, merged, rquery))
    )
    return F.when(scheme.isNotNull() & b["host"].isNotNull(), resolved)


def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform key — the Wayback /
    Common Crawl CDX index key: reversed host labels comma-joined,
    ')' then the lowercased path (+ '?query'), 'www.' and ports
    dropped ('https://WWW.Ex.COM/A/b?X=1' → 'com,ex)/a/b?x=1').
    Reversing the host puts every page of a registrable domain in one
    contiguous index range — the property that makes domain scans of
    a petabyte CDX index a range read instead of a full scan. Compose
    with url_canonicalize first for parameter-sorted keys. NULL for
    non-URLs."""
    u = url_parse(url)
    host = F.regexp_replace(u["host"], r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(
        F.when(F.coalesce(u["path"], F.lit("")) == "", F.lit("/")).otherwise(
            u["path"]
        )
    )
    q = F.when(
        u["query"].isNotNull(), F.concat(F.lit("?"), F.lower(u["query"]))
    ).otherwise(F.lit(""))
    return F.when(host.isNotNull(), F.concat(rev, F.lit(")"), path, q))
