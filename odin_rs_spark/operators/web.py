"""Web crawl-policy operators: robots.txt parsing and URL-permission
evaluation (RFC 9309, the Robots Exclusion Protocol) — the gate
between a crawl frontier (q163 sitemaps, q153 WARC inventories) and
what a pipeline may actually fetch/keep. Compliance filtering is also
a CURATION step: responsible corpus builders drop robots-disallowed
content at dataset-build time.

Semantics implemented (RFC 9309 §2.2):
- group = consecutive User-agent lines followed by Allow/Disallow
  rules; comments (#…) stripped; unknown directives ignored.
- a crawler obeys the group naming it specifically, else the '*'
  group; no group at all → everything allowed.
- matching = longest rule wins (most octets, §2.2.2); equal length →
  Allow wins.
- 'Disallow:' with an empty path matches nothing (allow-all).
- '*' matches any character sequence and a trailing '$' anchors the
  rule at the end of the path (§2.2.3 special characters): rules
  translate to anchored regexes at the join site — metacharacters
  escaped, '*' → '.*', trailing '$' kept as the anchor; a '$'
  anywhere else is literal.
Out of scope (documented): Crawl-delay, Sitemap discovery lines.

Scale shape: robots files are per-HOST and tiny — rules broadcast;
the URL side joins on the host equi-key and evaluates prefixes
against only that host's rules. URLs never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _robots_lines(
    robots: DataFrame, host_col: str, text_col: str, keys: tuple[str, ...]
) -> DataFrame:
    """(host, robots_txt) → one row per kept directive line with
    (host, pos, key lowered, val trimmed): comment/whitespace strip +
    line explode, filtered to `keys`. Pure column expressions."""
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
        )
        # strip comments + whitespace
        .withColumn("line", F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")))
        .filter(F.col("line") != "")
        .withColumn(
            "key", F.lower(F.trim(F.substring_index(F.col("line"), ":", 1)))
        )
        .withColumn(
            "val",
            F.trim(
                F.expr("substring(line, instr(line, ':') + 1, length(line))")
            ),
        )
        .filter(F.col("key").isin(*keys))
    )


def _grouped_lines(lines: DataFrame) -> DataFrame:
    """Assign RFC 9309 group ids: a User-agent line opens a NEW group
    iff the previous kept line was not also a User-agent line
    (consecutive UA lines share the group); lines before any UA line
    drop."""
    w = Window.partitionBy("host").orderBy("pos")
    return (
        lines.withColumn(
            "ua_start",
            (
                (F.col("key") == "user-agent")
                & (
                    F.coalesce(F.lag("key").over(w), F.lit(""))
                    != "user-agent"
                )
            ).cast("int"),
        )
        .withColumn("grp", F.sum("ua_start").over(w))
        .filter(F.col("grp") > 0)
    )


def _group_agents(grouped: DataFrame) -> DataFrame:
    return (
        grouped.filter(F.col("key") == "user-agent")
        .select("host", "grp", F.lower(F.col("val")).alias("agent"))
        .distinct()
    )


def robots_rules(robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → one row per (host, agent, rule): columns
    (host, agent lowercased, allow int, prefix, prefix_len). Pure
    column expressions: line explode + running group ids via window
    sums — no UDFs."""
    grouped = _grouped_lines(
        _robots_lines(
            robots, host_col, text_col, ("user-agent", "allow", "disallow")
        )
    )
    rules = grouped.filter(F.col("key") != "user-agent").select(
        "host",
        "grp",
        (F.col("key") == "allow").cast("int").alias("allow"),
        F.col("val").alias("prefix"),
        F.length("val").alias("prefix_len"),
    )
    return _group_agents(grouped).join(rules, ["host", "grp"]).select(
        "host", "agent", "allow", "prefix", "prefix_len"
    )


def robots_directives(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """The NON-rule robots.txt directives a crawl scheduler consumes:
    (host, agent, directive, value) rows for

    - 'sitemap' — RFC 9309 §2.3 allows it ANYWHERE in the file and it
      binds to no group: agent is NULL;
    - 'crawl-delay' — the de-facto politeness extension; binds to its
      group's agents exactly like Allow/Disallow.

    Sitemap values feed frontier DISCOVERY (q163's scan); crawl-delay
    feeds per-host fetch budgets. Pure column expressions."""
    lines = _robots_lines(
        robots, host_col, text_col, ("user-agent", "sitemap", "crawl-delay")
    )
    sitemaps = lines.filter(F.col("key") == "sitemap").select(
        "host",
        F.lit(None).cast("string").alias("agent"),
        F.lit("sitemap").alias("directive"),
        F.col("val").alias("value"),
    )
    grouped = _grouped_lines(lines)
    delays = (
        _group_agents(grouped)
        .join(
            grouped.filter(F.col("key") == "crawl-delay").select(
                "host", "grp", "val"
            ),
            ["host", "grp"],
        )
        .select(
            "host",
            "agent",
            F.lit("crawl-delay").alias("directive"),
            F.col("val").alias("value"),
        )
    )
    return sitemaps.unionByName(delays)


# Java-regex metacharacters a robots rule path could contain, escaped
# before '*' becomes '.*' (backslash FIRST so later escapes survive)
_RE_META = ("\\", ".", "[", "]", "{", "}", "(", ")", "+", "?", "^", "$", "|")


def _rule_regex(prefix):
    """RFC 9309 §2.2.3 rule path → anchored Java regex: escape
    metacharacters, '*' → '.*', then un-escape a rule-final '$' back
    into the end anchor. A plain rule compiles to '^literal' —
    exactly the old startswith semantics."""
    pat = prefix
    for ch in _RE_META:
        pat = F.replace(pat, F.lit(ch), F.lit("\\" + ch))
    pat = F.replace(pat, F.lit("*"), F.lit(".*"))
    # replacement-side '$' is a group reference in Java — escape it
    pat = F.regexp_replace(pat, r"\\\$$", "\\$")
    return F.concat(F.lit("^"), pat)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Evaluate the RFC 9309 match for `agent` over (host, path) rows:
    adds (allowed int, rule_len int — 0 when no rule matched). The
    agent's own group wins over '*'; within the group, the longest
    rule wins (most octets), ties go to Allow; '*'/'$' wildcard rules
    match via their regex translation; hosts without robots (or
    without a matching group) allow everything. Rules broadcast
    (per-host files are tiny); URLs never shuffle. Row multiplicity
    is preserved — duplicate frontier rows (refetches are normal) ride
    an injected unique id through the join/groupBy (ADVICE r7: the
    old groupBy over the value columns collapsed them)."""
    agent = agent.lower()
    r = rules.filter(F.col("agent").isin(agent, "*")).select(
        F.col("host").alias("__rh"),
        (F.col("agent") == agent).cast("int").alias("__specific"),
        "allow",
        "prefix",
        "prefix_len",
        _rule_regex(F.col("prefix")).alias("__pat"),
    )
    # does the specific group exist for this host? (if yes, '*' rules
    # are ignored entirely — RFC 9309: exactly one group applies)
    has_specific = (
        r.groupBy("__rh").agg(F.max("__specific").alias("__has"))
    )
    r2 = r.join(F.broadcast(has_specific), "__rh").filter(
        (F.col("__specific") == F.col("__has"))
    )
    keyed = urls.withColumn("__rid", F.monotonically_increasing_id())
    joined = keyed.join(
        F.broadcast(r2),
        (F.col(host_col) == F.col("__rh"))
        & (F.col("prefix") != "")
        & F.rlike(F.col(path_col), F.col("__pat")),
        "left",
    )
    pick = F.max(
        F.when(
            F.col("prefix").isNotNull(),
            F.struct(
                F.col("prefix_len").alias("l"),
                F.col("allow").alias("a"),
            ),
        )
    ).alias("__best")
    out = joined.groupBy("__rid").agg(
        *[F.first(c).alias(c) for c in urls.columns], pick
    )
    return out.select(
        *urls.columns,
        F.coalesce(F.col("__best.a"), F.lit(1)).alias("allowed"),
        F.coalesce(F.col("__best.l"), F.lit(0)).alias("rule_len"),
    )


def feed_entries(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """RSS 2.0 / Atom feed scan — the crawl-discovery surface next to
    sitemaps (q163): feeds announce NEW urls with timestamps, so a
    recrawl frontier polls them instead of re-walking whole sites.
    Detects the dialect from the root element, parses with the JVM
    `from_xml` (entities decode there — zero Python), and explodes one
    row per entry: (input cols…, kind, feed_title, title, link,
    published). RSS items carry <link> as TEXT; Atom entries carry it
    as the href ATTRIBUTE of <link/> — both normalized to `link`.

    Scale shape: pure column expressions over whatever scan delivered
    the XML (bytes never shuffle; one row in → n entries out)."""
    col = F.col(xml_col)
    rss = F.from_xml(
        col,
        "channel STRUCT<title STRING, "
        "item ARRAY<STRUCT<title STRING, link STRING, pubDate STRING>>>",
    )
    atom = F.from_xml(
        col,
        "title STRING, entry ARRAY<STRUCT<title STRING, "
        "link STRUCT<_href STRING>, updated STRING>>",
    )
    # dialect by ROOT element, not substring — '<rss' inside an Atom
    # entry's text must not misroute the whole feed (r9 self-review)
    root = F.regexp_extract(
        col, r"(?s)^\s*(?:<\?xml[^>]*>)?\s*(?:<!--.*?-->\s*)*<([A-Za-z]+)", 1
    )
    is_rss = root == "rss"
    kind = F.when(is_rss, F.lit("rss")).otherwise(F.lit("atom"))
    feed_title = F.when(is_rss, rss["channel"]["title"]).otherwise(
        atom["title"]
    )
    entries = F.when(
        is_rss,
        F.transform(
            rss["channel"]["item"],
            lambda it: F.struct(
                it["title"].alias("title"),
                it["link"].alias("link"),
                it["pubDate"].alias("published"),
            ),
        ),
    ).otherwise(
        F.transform(
            atom["entry"],
            lambda e: F.struct(
                e["title"].alias("title"),
                e["link"]["_href"].alias("link"),
                e["updated"].alias("published"),
            ),
        )
    )
    out = df.select(
        *df.columns, kind.alias("kind"), feed_title.alias("feed_title"),
        F.explode(entries).alias("__e"),
    )
    return out.select(
        *df.columns, "kind", "feed_title",
        F.col("__e.title").alias("title"),
        F.col("__e.link").alias("link"),
        F.col("__e.published").alias("published"),
    ).drop(xml_col)


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Per-host FETCH SCHEDULING honoring Crawl-delay (the operator
    that turns q186's parsed directive into a crawl plan): within each
    host, urls take slots in deterministic (url) order and slot i
    fetches at i·delay_ms — the earliest schedule a polite crawler can
    run. Adds `slot` and `fetch_ms`; a host's makespan is
    (n_urls−1)·delay_ms, which is exactly the quantity a frontier
    balancer partitions hosts by.

    Hosts ABSENT from the `delays` dim schedule with delay 0 (RFC 9309
    has no default politeness — a missing Crawl-delay means none; an
    inner join here would silently DROP those hosts' urls from the
    plan, the worst possible failure for a frontier).

    Scale shape: `delays` is a per-host dim (broadcast); the window is
    partitioned BY HOST — the natural key, so state per partition is
    one host's url list and skew equals the biggest single host (the
    same bound any per-host crawler has)."""
    w = Window.partitionBy(host_col).orderBy(url_col)
    out = urls.join(F.broadcast(delays), host_col, "left")
    return out.withColumn(
        "delay_ms", F.coalesce(F.col("delay_ms"), F.lit(0))
    ).withColumn("slot", F.row_number().over(w) - 1).withColumn(
        "fetch_ms", F.col("slot") * F.col("delay_ms")
    )


def canonical_url(html, page_url):
    """The page's DECLARED canonical identity — `<link rel="canonical"
    href=…>` (RFC 6596), resolved against the page URL when relative.
    The dedup signal a crawl pipeline gets for FREE: alias pages
    (tracking-parameter variants, mobile mirrors, paginated views)
    declare which URL they are a copy of, no content hashing needed —
    canonical clustering belongs BEFORE MinHash in a dedup ladder
    because it is exact and costs one regexp per page.

    Pure column math (two RE2-safe regexps + url_resolve), zero UDF:
    attribute order is free in HTML so the tag is located by its
    rel=canonical attribute first and href is extracted from the
    matched tag text; quoting may be double, single or absent. Pages
    with no canonical link are their OWN canonical (fall back to the
    page URL) — the identity a crawler assumes.
    """
    from odin_rs_spark.functions.web import url_resolve

    html = F.col(html) if isinstance(html, str) else html
    page_url = F.col(page_url) if isinstance(page_url, str) else page_url
    tag = F.regexp_extract(
        html, "(?i)<link[^>]*rel\\s*=\\s*[\"']?canonical[^>]*>", 0
    )
    href = F.regexp_extract(
        tag, "(?i)href\\s*=\\s*[\"']?([^\"'\\s>]+)", 1
    )
    return F.when(href == "", page_url).otherwise(url_resolve(page_url, href))


def robots_meta_flags(html, x_robots_tag=None):
    """Page-level indexing directives — the `<meta name="robots">` tag
    and the `X-Robots-Tag` response header (the Robots Exclusion
    Protocol's page-granularity half: robots.txt gates FETCHING, these
    gate KEEPING — a responsible corpus drops noindex pages at build
    time just like disallowed paths). Directives come from either
    channel and the union is most-restrictive: `noindex`/`nofollow`
    from the meta tag OR the header both bind, and `none` means both
    (the documented REP token table).

    Returns a struct column `(noindex boolean, nofollow boolean)`.
    Pure column math, zero UDF: EVERY name=robots tag is located
    (real pages carry several; directives union across them, again
    most-restrictive — attribute order free, quoting double/single/
    absent), content extracted from each matched tag's text; tokens
    match on comma/space boundaries so `noindexing` never
    false-positives.
    """
    html = F.col(html) if isinstance(html, str) else html
    if x_robots_tag is None:
        header = F.lit("")
    elif isinstance(x_robots_tag, str):
        header = F.coalesce(F.col(x_robots_tag), F.lit(""))
    else:
        header = F.coalesce(x_robots_tag, F.lit(""))
    # \b after 'robots' keeps an unquoted name=robotsxyz from matching
    tags = F.regexp_extract_all(
        html, F.lit("(?i)<meta[^>]*name\\s*=\\s*[\"']?robots\\b[\"']?[^>]*>"), 0
    )
    def _content(tag):
        quoted = F.regexp_extract(tag, "(?i)content\\s*=\\s*[\"']([^\"']*)", 1)
        bare = F.regexp_extract(tag, "(?i)content\\s*=\\s*([^\\s\"'>]+)", 1)
        return F.when(quoted != "", quoted).otherwise(bare)
    content = F.array_join(F.transform(tags, _content), ",")
    merged = F.lower(F.concat_ws(",", content, header))
    def _has(token):
        return merged.rlike("(^|[ ,])(" + token + "|none)([ ,]|$)")
    return F.struct(
        _has("noindex").alias("noindex"), _has("nofollow").alias("nofollow")
    )


def blocklist_match(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    out_col: str = "block_category",
) -> DataFrame:
    """Categorized domain-blocklist filtering (the UT1/URLhaus-style
    gate every responsible corpus runs: adult/malware/tracker domains
    out before any content work) — an entry blocks a host AND every
    subdomain of it, the MOST SPECIFIC (longest) matching entry names
    the category. Unblocked rows carry NULL.

    Scale shape: the registered_domain_psl recipe — each host explodes
    into its ≤L label suffixes, one broadcast LEFT equi-join against
    the blocklist dim (blocklists are ~10^6 rows, hosts ~10^7 distinct
    — run on the distinct-host dim and broadcast the verdict back to
    pages), one groupBy on an injected row id picks the longest match.
    Payload columns ride THROUGH the groupBy (the one-lineage
    monotonically_increasing_id rule; q183 bug class)."""
    keyed = df.withColumn("__rid", F.monotonically_increasing_id())
    labels = F.split(F.col(host_col), r"\.")
    L = F.size(labels)
    cand = keyed.select(
        *df.columns,
        "__rid",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), L),
                lambda i: F.array_join(F.slice(labels, L - i + 1, i), "."),
            )
        ).alias("__sfx"),
    )
    dim = blocklist.select(
        F.col("suffix").alias("__sfx"), F.col("category").alias("__cat")
    )
    j = cand.join(F.broadcast(dim), "__sfx", "left")
    pick = F.max(
        F.when(
            F.col("__cat").isNotNull(),
            F.struct(
                F.length("__sfx").alias("n"), F.col("__cat").alias("c")
            ),
        )
    )
    out = j.groupBy("__rid", *df.columns).agg(pick.alias("__m"))
    return out.select(*df.columns, F.col("__m.c").alias(out_col))


def frontier_url_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-shape signals a crawl frontier prioritizes by BEFORE
    fetching anything (the cheapest spam/trap defenses a scheduler
    has: calendar pages generate infinite date paths, session-id
    params make one page look like a million, deep digit-heavy paths
    are auto-generated listings):

      depth           path segments
      n_params        query parameters
      f_deep          depth > 8
      f_date_path     a /2012/05(/...)-style calendar segment pair
      f_session       sid/sessionid/phpsessid/jsessionid query param
      f_digit_heavy   2*digits > letters within the path
      trap_score      sum of the four flags

    Pure column math, zero UDF; every pattern RE2-safe. Thresholds
    are integers — no float boundary anywhere."""
    url = F.col(url_col)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    n_params = F.size(F.filter(F.split(query, "&"), lambda s: s != ""))
    n_digit = F.length(path) - F.length(
        F.regexp_replace(path, "[0-9]", "")
    )
    n_alpha = F.length(path) - F.length(
        F.regexp_replace(path, "[A-Za-z]", "")
    )
    f_deep = (depth > 8).cast("int")
    f_date = path.rlike(r"/20[0-9][0-9]/[0-9]{1,2}(/|$)").cast("int")
    f_session = F.lower(query).rlike(
        r"(^|&)(sid|sessionid|phpsessid|jsessionid)="
    ).cast("int")
    f_digit = (2 * n_digit > n_alpha).cast("int")
    score = f_deep + f_date + f_session + f_digit
    return df.select(
        "*",
        depth.alias("depth"),
        n_params.alias("n_params"),
        f_deep.alias("f_deep"),
        f_date.alias("f_date_path"),
        f_session.alias("f_session"),
        f_digit.alias("f_digit_heavy"),
        score.alias("trap_score"),
    )


def waterfill_alloc(
    need: DataFrame,
    budget: Column,
    key_col: str = "host",
    need_col: str = "need",
) -> DataFrame:
    """Max-min fair (water-filling) allocation of an integer budget
    across keys: keys under the water level receive their full need,
    the rest are capped at the level, and the integer remainder goes
    to the first capped keys in (need, key) order.  Adds ``alloc`` and
    ``capped``.

    Scale shape: every window runs over the per-key DIM (hosts, not
    pages — dim-sized next to any corpus); the unpartitioned sort
    window is over that dim only.  ``budget`` is a scalar Column — a
    literal, or an expression over ``F.col("__tot")`` (the summed
    need) / ``F.col("__m")`` (the key count), e.g.
    ``F.floor(3 * F.col("__tot") / 5)`` for a 60% budget."""
    # the per-key need table is dim-sized (the operator's own scale
    # bound above) and feeds the total agg, the ranked window, the
    # feasibility probe and the final solve — materialize it once so
    # the caller's (possibly expensive) frontier pipeline upstream is
    # not re-executed per consumer, then cut the ranked window the
    # same way (kstar and the solve both read it)
    need = need.localCheckpoint(eager=True)
    total = need.agg(
        F.sum(need_col).alias("__tot"), F.count(F.lit(1)).alias("__m")
    )
    w = Window.orderBy(need_col, key_col)
    ranked = (
        need.crossJoin(F.broadcast(total))
        .withColumn("__k", F.row_number().over(w))
        .withColumn("__pfx", F.sum(need_col).over(w))
        .withColumn("__b", budget)
        .localCheckpoint(eager=True)
    )
    feasible = (
        F.col("__pfx") + (F.col("__m") - F.col("__k")) * F.col(need_col)
        <= F.col("__b")
    )
    kstar = ranked.where(feasible).agg(F.max("__k").alias("__kstar"))
    solved = ranked.crossJoin(F.broadcast(kstar)).withColumn(
        "__kstar", F.coalesce(F.col("__kstar"), F.lit(0))
    )
    pk = F.max(
        F.when(F.col("__k") == F.col("__kstar"), F.col("__pfx"))
    ).over(Window.partitionBy(F.lit(1)))
    solved = solved.withColumn("__pk", F.coalesce(pk, F.lit(0)))
    rest = F.col("__m") - F.col("__kstar")
    # greatest() guard: rest=0 (budget covers every need) must not hit
    # ANSI divide-by-zero — the outer when() returns full need there
    level = F.floor(
        (F.col("__b") - F.col("__pk")) / F.greatest(rest, F.lit(1))
    )
    rem = F.col("__b") - F.col("__pk") - rest * level
    alloc = F.when(F.col("__k") <= F.col("__kstar"), F.col(need_col)).otherwise(
        level + ((F.col("__k") - F.col("__kstar")) <= rem).cast("bigint")
    )
    return solved.select(
        *need.columns,
        F.when(rest > 0, alloc).otherwise(F.col(need_col))
        .cast("bigint")
        .alias("alloc"),
    ).withColumn("capped", F.col("alloc") < F.col(need_col))
