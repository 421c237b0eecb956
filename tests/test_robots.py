"""robots.txt parsing + RFC 9309 permission evaluation
(operators/web)."""

from __future__ import annotations

from pyspark.sql import functions as F

from odin_rs_spark.operators.web import robots_allowed, robots_rules

ROBOTS_A = """# fleet policy
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp

User-agent: odinbot
User-agent: otherbot
Disallow: /
Allow: /public
"""

ROBOTS_B = """Disallow: /ignored-no-group
User-agent: *
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return robots_rules(df)


def test_robots_rules_groups_and_comments(spark):
    rows = _rules(spark).collect()
    a = {(r.agent, r.allow, r.prefix) for r in rows if r.host == "a.example"}
    # '*' group: 3 rules; odinbot AND otherbot share the second group
    assert ("*", 0, "/private") in a and ("*", 1, "/private/ok") in a
    assert ("odinbot", 0, "/") in a and ("otherbot", 1, "/public") in a
    # rules before any User-agent line are ignored
    b = {(r.agent, r.prefix) for r in rows if r.host == "b.example"}
    assert b == {("*", "")}


def test_robots_allowed_semantics(spark):
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [
            ("a.example", "/private/x"),      # disallow /private
            ("a.example", "/private/ok/y"),   # longer Allow wins
            ("a.example", "/public/z"),       # no rule -> allow
            ("a.example", "/tmpfile"),        # prefix match, no slash needed
            ("b.example", "/anything"),       # empty Disallow matches nothing
            ("c.example", "/no/robots"),      # host without robots -> allow
        ],
        "host string, path string",
    )
    star = {
        (r.host, r.path): (r.allowed, r.rule_len)
        for r in robots_allowed(urls, rules, agent="MyCrawler").collect()
    }
    assert star[("a.example", "/private/x")] == (0, len("/private"))
    assert star[("a.example", "/private/ok/y")] == (1, len("/private/ok"))
    assert star[("a.example", "/public/z")] == (1, 0)
    assert star[("a.example", "/tmpfile")] == (0, 4)
    assert star[("b.example", "/anything")] == (1, 0)
    assert star[("c.example", "/no/robots")] == (1, 0)

    # the specific group REPLACES '*' entirely (RFC 9309: one group)
    bot = {
        (r.host, r.path): (r.allowed, r.rule_len)
        for r in robots_allowed(urls, rules, agent="OdinBot").collect()
    }
    assert bot[("a.example", "/private/x")] == (0, 1)   # Disallow: /
    assert bot[("a.example", "/public/z")] == (1, len("/public"))
    assert bot[("c.example", "/no/robots")] == (1, 0)

    # tie length -> Allow wins
    tie_rules = robots_rules(
        spark.createDataFrame(
            [("t.example", "User-agent: *\nDisallow: /x\nAllow: /x\n")],
            "host string, robots_txt string",
        )
    )
    t = robots_allowed(
        spark.createDataFrame([("t.example", "/xyz")], "host string, path string"),
        tie_rules,
        agent="any",
    ).first()
    assert (t.allowed, t.rule_len) == (1, 2)


def test_robots_duplicate_frontier_rows_preserved(spark):
    """ADVICE r7: refetches are normal in a frontier — N identical
    (host, path) rows must come back as N rows, not one."""
    rules = _rules(spark)
    urls = spark.createDataFrame(
        [("a.example", "/private/x")] * 3 + [("c.example", "/ok")] * 2,
        "host string, path string",
    )
    rows = robots_allowed(urls, rules, agent="MyCrawler").collect()
    assert len(rows) == 5
    got = sorted((r.host, r.path, r.allowed) for r in rows)
    assert got == [("a.example", "/private/x", 0)] * 3 + [("c.example", "/ok", 1)] * 2


def test_robots_wildcards_and_anchors(spark):
    """RFC 9309 §2.2.3 special characters: '*' spans any sequence,
    trailing '$' anchors at end-of-path, mid-rule '$' is literal,
    regex metacharacters in rule paths stay literal."""
    txt = (
        "User-agent: *\n"
        "Disallow: /*.pdf$\n"
        "Disallow: /tmp*/x\n"
        "Disallow: /lit.eral\n"
        "Allow: /tmp42/x/ok\n"
    )
    rules = robots_rules(
        spark.createDataFrame(
            [("w.example", txt)], "host string, robots_txt string"
        )
    )
    urls = spark.createDataFrame(
        [
            ("w.example", "/docs/a.pdf"),      # *.pdf$ -> disallow
            ("w.example", "/docs/a.pdf?x"),    # not at end -> no match
            ("w.example", "/tmp42/xfile"),     # /tmp*/x -> disallow
            ("w.example", "/tmp42/x/ok/y"),    # longer Allow wins
            ("w.example", "/litAeral"),        # '.' must stay literal
            ("w.example", "/lit.eral/f"),      # literal match -> disallow
        ],
        "host string, path string",
    )
    got = {
        (r.host, r.path): (r.allowed, r.rule_len)
        for r in robots_allowed(urls, rules, agent="any").collect()
    }
    assert got[("w.example", "/docs/a.pdf")] == (0, len("/*.pdf$"))
    assert got[("w.example", "/docs/a.pdf?x")] == (1, 0)
    assert got[("w.example", "/tmp42/xfile")] == (0, len("/tmp*/x"))
    assert got[("w.example", "/tmp42/x/ok/y")] == (1, len("/tmp42/x/ok"))
    assert got[("w.example", "/litAeral")] == (1, 0)
    assert got[("w.example", "/lit.eral/f")] == (0, len("/lit.eral"))


def test_robots_directives(spark):
    """Sitemap binds to NO group (legal anywhere, even before the
    first User-agent line); Crawl-delay binds to its group's agents
    like Allow/Disallow; rules-only files yield nothing."""
    from odin_rs_spark.operators.web import robots_directives

    txt = (
        "Sitemap: https://a.example/sm1.xml\n"
        "User-agent: *\nDisallow: /x\nCrawl-delay: 2\n"
        "Sitemap: https://a.example/sm2.xml\n"
        "User-agent: fastbot\nUser-agent: slowbot\nCrawl-delay: 9\n"
    )
    df = spark.createDataFrame(
        [("a.example", txt), ("b.example", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    rows = {
        (r.host, r.agent, r.directive, r.value)
        for r in robots_directives(df).collect()
    }
    assert rows == {
        ("a.example", None, "sitemap", "https://a.example/sm1.xml"),
        ("a.example", None, "sitemap", "https://a.example/sm2.xml"),
        ("a.example", "*", "crawl-delay", "2"),
        ("a.example", "fastbot", "crawl-delay", "9"),
        ("a.example", "slowbot", "crawl-delay", "9"),
    }


def test_robots_rules_broadcast_urls_never_shuffle(spark):
    rules = _rules(spark)
    urls = spark.range(100).select(
        F.lit("a.example").alias("host"),
        F.concat(F.lit("/p/"), F.col("id")).alias("path"),
    )
    plan = (
        robots_allowed(urls, rules, agent="x")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:800]
