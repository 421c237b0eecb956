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
