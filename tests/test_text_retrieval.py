"""Unit/property tests for round-3 text & membership operators:
line-level dedup, winnowing fingerprints, BM25, Bloom filters."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from odin_rs_spark.operators.dedup import bloom_build, bloom_probe
from odin_rs_spark.operators.text import (
    bm25_topk,
    line_dup_stats,
    winnow_fingerprints,
    winnow_matches,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------


def test_line_dup_stats_flags_shared_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-word segment
    docs = _docs(
        spark,
        [
            (1, boiler + " " + " ".join(f"u1x{i}" for i in range(10))),
            (2, boiler + " " + " ".join(f"u2x{i}" for i in range(10))),
            (3, " ".join(f"u3x{i}" for i in range(20))),
        ],
    )
    out = {r["doc_id"]: r for r in line_dup_stats(docs, seg_words=10).collect()}
    # docs 1/2 share exactly their first segment; doc 3 shares nothing
    assert out[1]["n_segs"] == 2 and out[1]["n_dup_segs"] == 1
    assert out[2]["n_dup_segs"] == 1
    assert out[3]["n_dup_segs"] == 0
    assert abs(out[1]["dup_ratio"] - 0.5) < 1e-9


def test_line_dup_stats_within_doc_repeat_not_flagged(spark):
    # the same segment twice inside ONE doc is repetition, not boilerplate
    seg = " ".join(f"r{i}" for i in range(10))
    docs = _docs(spark, [(1, seg + " " + seg)])
    row = line_dup_stats(docs, seg_words=10).collect()[0]
    assert row["n_segs"] == 2 and row["n_dup_segs"] == 0


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_run_detected(spark):
    # winnowing guarantee: a shared word run of >= w + k - 1 = 6 words
    # must produce at least one shared fingerprint hash (k=3, w=4)
    shared = "alpha beta gamma delta epsilon zeta"  # 6 words
    docs = _docs(
        spark,
        [
            (1, "one two three " + shared + " four five six"),
            (2, "seven eight " + shared + " nine ten eleven twelve"),
        ],
    )
    pairs = winnow_matches(docs, k=3, w=4, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0]["id_a"] == 1 and pairs[0]["id_b"] == 2


def test_winnow_no_match_without_shared_grams(spark):
    docs = _docs(
        spark,
        [(1, " ".join(f"a{i}" for i in range(30))), (2, " ".join(f"b{i}" for i in range(30)))],
    )
    assert winnow_matches(docs, k=3, w=4, min_shared=1).count() == 0


def test_winnow_density_and_coverage(spark):
    # ~2/(w+1) of gram positions selected; every window of w grams
    # contains at least one selected position (coverage invariant)
    n_words = 200
    docs = _docs(spark, [(1, " ".join(f"w{i * 7919 % 997}x{i}" for i in range(n_words)))])
    fps = sorted(
        r["pos"] for r in winnow_fingerprints(docs, k=3, w=4).collect()
    )
    n_grams = n_words - 2
    density = len(set(fps)) / n_grams
    assert 0.2 < density < 0.6  # theory: 2/(w+1) = 0.4
    # coverage: adjacent selected positions can be at most w apart
    gaps = [b - a for a, b in zip(fps, fps[1:])]
    assert max(gaps) <= 4
    assert fps[0] <= 3 and fps[-1] >= n_grams - 4


def test_winnow_short_doc_single_window(spark):
    docs = _docs(spark, [(1, "just two")])  # 1 gram < w
    fps = winnow_fingerprints(docs, k=3, w=4).collect()
    assert len(fps) == 1 and fps[0]["pos"] == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    corpus = [
        (1, "spark runs fast spark wins"),
        (2, "ducks swim in a row"),
        (3, "spark and ducks share a pond today ok"),
        (4, "nothing relevant here at all"),
    ]
    terms = ["spark", "ducks"]
    docs = _docs(spark, corpus)
    got = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, terms, topk=10).collect()}

    # plain-python reference
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    want = {}
    for d, words in toks.items():
        s = 0.0
        for t in terms:
            tf = words.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(words) / avgdl))
        if s > 0:
            want[d] = round(s, 6)
    assert got == want
    # doc with both terms outranks single-term docs here
    order = [r["doc_id"] for r in bm25_topk(docs, terms, topk=10).collect()]
    assert order[0] == 3


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(300)], "k string"
    )
    bloom = bloom_build(members, "k", m_bits=8192, k=4)
    # bitmap is tiny regardless of member count
    assert bloom.count() <= 8192 // 60 + 1
    probe = spark.createDataFrame(
        [(f"key{i}",) for i in range(300)] + [(f"other{i}",) for i in range(1000)],
        "k string",
    )
    out = bloom_probe(probe, "k", bloom, m_bits=8192, k=4).collect()
    flags = {r["k"]: r["maybe_member"] for r in out}
    # NO false negatives, ever
    assert all(flags[f"key{i}"] for i in range(300))
    # false positives bounded: theory (1-e^(-4*300/8192))^4 ~ 0.03%...
    # allow generous slack for hash clustering
    fp = sum(1 for i in range(1000) if flags[f"other{i}"])
    assert fp <= 25


def test_bloom_probe_empty_filter_rejects_all(spark):
    empty = bloom_build(
        spark.createDataFrame([], "k string"), "k", m_bits=4096, k=4
    )
    probe = spark.createDataFrame([("a",), ("b",)], "k string")
    out = bloom_probe(probe, "k", empty, m_bits=4096, k=4).collect()
    assert all(not r["maybe_member"] for r in out)


# ---------------------------------------------------------------------------
# DSIR + bigram LM
# ---------------------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    from odin_rs_spark.operators.corpus import dsir_select

    target = _docs(
        spark, [(100 + i, "alpha beta gamma delta " * 5) for i in range(10)]
    )
    raw = _docs(
        spark,
        [(1, "alpha beta gamma delta alpha beta gamma delta")]
        + [(i, "zeta eta theta iota kappa lambda mu nu") for i in range(2, 12)],
    )
    top = dsir_select(raw, target, k=3).collect()
    # the target-like doc dominates: its ln-weight gap to the off-target
    # docs is far larger than any Gumbel draw
    assert top[0]["doc_id"] == 1
    assert top[0]["ln_weight"] > top[1]["ln_weight"] + 5


def test_dsir_deterministic(spark):
    from odin_rs_spark.operators.corpus import dsir_select

    target = _docs(spark, [(100, "a b c d e f g h")])
    raw = _docs(spark, [(i, f"a b c x{i} y{i} z{i}") for i in range(8)])
    a = [tuple(r) for r in dsir_select(raw, target, k=5).collect()]
    b = [tuple(r) for r in dsir_select(raw, target, k=5).collect()]
    assert a == b and len(a) == 5


def test_bigram_logprob_matches_python_reference(spark):
    import math

    from odin_rs_spark.operators.text import bigram_logprob

    corpus = [(1, "a b a b c"), (2, "a b c a"), (3, "c c a b")]
    lam = 0.7
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in bigram_logprob(_docs(spark, corpus), lam=lam).collect()
    }

    toks = {d: t.split() for d, t in corpus}
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for ws in toks.values():
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i > 0:
                bi[(ws[i - 1], w)] = bi.get((ws[i - 1], w), 0) + 1
    n = sum(uni.values())
    for d, ws in toks.items():
        lps = [math.log(uni[ws[0]] / n)]
        for i in range(1, len(ws)):
            p = lam * bi[(ws[i - 1], ws[i])] / uni[ws[i - 1]] + (1 - lam) * uni[ws[i]] / n
            lps.append(math.log(p))
        want = round(sum(lps) / len(lps), 6)
        assert got[d] == (len(ws), want), (d, got[d], want)


# ---------------------------------------------------------------------------
# sketches: HLL + CMS
# ---------------------------------------------------------------------------


def test_hll_error_within_bound(spark):
    from odin_rs_spark.operators.sketches import hll_distinct

    # 3 groups with very different cardinalities; std error at p=10 is
    # ~3.2%, assert within 4 sigma
    rows = []
    for g, n in (("a", 50), ("b", 2000), ("c", 12000)):
        rows += [(g, f"{g}-{i}") for i in range(n)]
    df = spark.createDataFrame(rows, "g string, k string")
    got = {r["g"]: r["hll_estimate"] for r in hll_distinct(df, "k", ["g"], p=10).collect()}
    for g, n in (("a", 50), ("b", 2000), ("c", 12000)):
        assert abs(got[g] - n) / n < 0.13, (g, got[g], n)


def test_hll_duplicates_do_not_move_estimate(spark):
    from odin_rs_spark.operators.sketches import hll_distinct

    once = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string")
    tenx = spark.createDataFrame(
        [(f"k{i}",) for i in range(500) for _ in range(10)], "k string"
    )
    a = hll_distinct(once, "k", p=10).collect()[0]["hll_estimate"]
    b = hll_distinct(tenx, "k", p=10).collect()[0]["hll_estimate"]
    assert a == b


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    from odin_rs_spark.operators.sketches import cms_build, cms_query

    # heavy skew: one key at 5000, the rest light
    rows = [("hot",)] * 5000 + [(f"k{i}",) for i in range(200) for _ in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, "k string")
    truth = {}
    for (k,) in rows:
        truth[k] = truth.get(k, 0) + 1
    keys = spark.createDataFrame([(k,) for k in truth], "k string")
    est = {r["k"]: r["cms_est"] for r in cms_query(keys, "k", cms_build(df, "k"), ).collect()}
    n = len(rows)
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)  # CMS never underestimates
        assert est[k] <= t + 0.02 * n, (k, est[k], t)  # eps = e/w ~ 0.0027
    # the heavy hitter is approximated tightly in relative terms
    assert est["hot"] / truth["hot"] < 1.05


def test_cms_probe_zero_shuffle(spark):
    from odin_rs_spark.operators.sketches import cms_build, cms_query

    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "k string")
    cms = cms_build(df, "k")
    plan = (
        cms_query(df, "k", cms)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_winnow_matches_base_code_cap(spark):
    # a boilerplate run shared by ALL docs is "base code" (MOSS): with
    # max_docs_per_hash set, it stops generating pairs; the pair that
    # shares a RARE run survives
    boiler = " ".join(f"c{i}" for i in range(8))
    rare = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [(1, boiler + " " + rare), (2, boiler + " " + rare)]
        + [(i, boiler + f" tail{i} x{i} y{i}") for i in range(3, 9)],
    )
    uncapped = winnow_matches(docs, k=3, w=4, min_shared=1)
    n_uncapped = uncapped.count()
    assert n_uncapped > 10  # boilerplate pairs everyone with everyone
    capped = winnow_matches(
        docs, k=3, w=4, min_shared=1, max_docs_per_hash=2
    ).collect()
    # cap kills the all-pairs boilerplate clique (the cap counts docs
    # where a hash was SELECTED, so a near-boundary boilerplate hash
    # selected in exactly 2 docs may legitimately survive)
    assert len(capped) < n_uncapped / 3
    best = max(capped, key=lambda r: r["n_shared"])
    assert (best["id_a"], best["id_b"]) == (1, 2)  # the rare shared run wins


def test_remove_dup_segments_planted_boilerplate(spark):
    from odin_rs_spark.operators.text import remove_dup_segments

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-word segment
    uniq = {d: " ".join(f"u{d}w{i}" for i in range(10)) for d in range(3)}
    rows = [(d, boiler + " " + uniq[d]) for d in range(3)]
    rows.append((9, " ".join(f"only{i}" for i in range(10))))  # no boilerplate
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in remove_dup_segments(df, seg_words=10).collect()}
    for d in range(3):
        # the shared leading segment is removed; the unique tail survives
        assert got[d].n_segs == 2 and got[d].n_removed == 1
        assert got[d].clean_text == uniq[d]
    assert got[9].n_removed == 0 and got[9].clean_text == rows[3][1]


def test_remove_dup_segments_order_and_empty(spark):
    from odin_rs_spark.operators.text import remove_dup_segments

    seg = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    shared = seg("s")
    # doc 1: unique-A, shared, unique-B → rebuild must keep A before B
    df = spark.createDataFrame(
        [
            (1, " ".join([seg("a"), shared, seg("b")])),
            (2, shared),  # all boilerplate → empty clean_text
            (3, shared + " " + seg("c")),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in remove_dup_segments(df, seg_words=10).collect()}
    assert got[1].clean_text == seg("a") + " " + seg("b")
    assert got[2].clean_text == "" and got[2].n_removed == 1
    assert got[3].clean_text == seg("c")
    assert set(got) == {1, 2, 3}  # all-boilerplate docs still emit a row


def test_bpe_token_stats_matches_python_re(spark):
    import re

    from odin_rs_spark.functions.text import TOKEN_PATTERN
    from odin_rs_spark.operators.text import bpe_token_stats

    texts = [
        "hello world",
        "it's a 12.5% gain (net), v2!",
        "a-b--c 007 ...",
    ]
    df = spark.createDataFrame(
        [(i, "g", t) for i, t in enumerate(texts)], ["doc_id", "grp", "text"]
    )
    out = bpe_token_stats(df, keys=["grp"]).collect()[0]
    n_bpe = sum(len(re.findall(TOKEN_PATTERN, t)) for t in texts)
    n_ws = sum(len(t.split()) for t in texts)
    assert out.n_bpe_tokens == n_bpe
    assert out.n_ws_tokens == n_ws
    assert out.avg_inflation >= 1.0


def test_winnow_rejects_overflow_window(spark):
    import pytest as _pytest

    from odin_rs_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match=r"\[1, 8\]"):
        winnow_fingerprints(df, w=9)
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_bpe_train_merges_known_corpus(spark):
    """Hand-checkable corpus: 'low low low lower newest newest' —
    merge 0 must be the most frequent adjacent pair with (count DESC,
    lhs, rhs) tie-breaking, and later merges must build on earlier
    ones (second-order merges)."""
    from odin_rs_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "low low low lower lower newest newest newest newest")],
        "doc_id long, text string",
    )
    m = {r.merge_rank: (r.lhs, r.rhs, r.pair_count) for r in
         bpe_train_merges(docs, num_merges=6).collect()}
    # pair counts over words {low:3, lower:2, newest:4}:
    # (w,e) = lower 2 + newest 4 = 6 wins round 0
    assert m[0] == ("w", "e", 6)
    # round 1: low/lower both contribute (l,o) = 5; (o,w) fell to 3
    # because lower is now [l,o,we,r]
    assert m[1] == ("l", "o", 5)
    # round 2: four pairs tie at 4 ((e,we),(n,e),(s,t),(we,s)) ->
    # lexicographic tie-break picks (e,we); the chain then grows
    # ewe -> ewes -> ewest -> newest, all second-order merges
    assert m[2] == ("e", "we", 4)
    assert m[3] == ("ewe", "s", 4)
    assert m[4] == ("ewes", "t", 4)
    assert m[5] == ("n", "ewest", 4)
    # merges must chain: every later lhs/rhs is either a char or a
    # previously-built symbol
    built = set("abcdefghijklmnopqrstuvwxyz")
    for r in sorted(m):
        lhs, rhs, _ = m[r]
        assert lhs in built and rhs in built, (r, lhs, rhs)
        built.add(lhs + rhs)


def test_bpe_train_early_stop_and_separator_guard(spark):
    from odin_rs_spark.operators.text import bpe_train_merges

    # all words distinct single chars -> zero pairs -> zero merges
    docs = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    assert bpe_train_merges(docs, num_merges=4).count() == 0

    # min_pair_count stops training once the best pair is rare
    docs2 = spark.createDataFrame(
        [(1, "aa aa ab")], "doc_id long, text string"
    )
    m = bpe_train_merges(docs2, num_merges=4, min_pair_count=3).collect()
    # (a,a)=2 and (a,b)=1 both < 3 -> nothing learned
    assert m == []

    # words containing the separator char are excluded, not corrupted
    docs3 = spark.createDataFrame(
        [(1, "x·y x·y zz zz zz")], "doc_id long, text string"
    )
    m3 = bpe_train_merges(docs3, num_merges=2).collect()
    assert all("·" not in r.lhs + r.rhs for r in m3)
    assert m3[0].lhs == "z" and m3[0].rhs == "z" and m3[0].pair_count == 3


def test_bpe_segment_words_applies_in_order(spark):
    """BPE is merge-ORDER sensitive: applying (l,o) then (lo,w) must
    tokenize 'low' as [low] (1 token), while the reverse order leaves
    it as [lo, w] (2 tokens — the (lo,w) merge can't fire before (l,o)
    exists)."""
    from odin_rs_spark.operators.text import bpe_segment_words

    words = spark.createDataFrame([("low",), ("lot",)], "w string")
    fwd = {r.w: r.n_tokens for r in
           bpe_segment_words(words, [("l", "o"), ("lo", "w")]).collect()}
    assert fwd == {"low": 1, "lot": 2}  # l+o -> lo, lo+w -> low; lot = lo,t
    rev = {r.w: r.n_tokens for r in
           bpe_segment_words(words, [("lo", "w"), ("l", "o")]).collect()}
    assert rev == {"low": 2, "lot": 2}  # (lo,w) fires on nothing first


def test_html_to_text_extraction(spark):
    from odin_rs_spark.operators.text import html_to_text, link_density

    html = (
        "<html><head><title>T</title><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Head&nbsp;line</h1><p>one &amp; two &lt;three&gt;</p>"
        "<a href='/x'>a link</a> tail</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = df.select(
        html_to_text("html").alias("t"), link_density("html").alias("ld")
    ).first()
    assert row.t == "T Head line one & two <three> a link tail"
    # anchors: "a link" (6 chars) over the 41-char visible text
    assert row.ld == pytest.approx(len("a link") / len(row.t))

    # script/style can't cross-close; empty doc -> NULL density
    tricky = "<style>s</style><script>a</script><a href=x>only</a>"
    r2 = spark.createDataFrame([(1, tricky)], "i long, h string").select(
        html_to_text("h").alias("t"), link_density("h").alias("ld")
    ).first()
    assert r2.t == "only" and r2.ld == 1.0
    r3 = spark.createDataFrame([(1, "<p></p>")], "i long, h string").select(
        link_density("h").alias("ld")
    ).first()
    assert r3.ld is None

    # zero Python in the plan
    plan = (
        df.select(html_to_text("html"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_html_numeric_entities(spark):
    """HTML5 numeric character references (VERDICT r7 #3): decimal,
    hex, named additions, astral 4-byte UTF-8, single-pass &amp;
    semantics, out-of-range tokens kept verbatim."""
    from odin_rs_spark.operators.text import (
        decode_numeric_entities,
        html_to_text,
    )

    cases = {
        # the ubiquitous curly quote, both spellings
        "it&#8217;s &#x2019; fine": "it’s ’ fine",
        # 2-byte (é) and named additions
        "caf&#xE9; &mdash; &hellip; &ldquo;q&rdquo;": "café — … “q”",
        # astral plane: 4-byte UTF-8
        "hi &#128512;": "hi 😀",
        # single-pass: &amp;#39; is the LITERAL text '&#39;'
        "a &amp;#39; b": "a &#39; b",
        # out-of-range / surrogate / NUL stay verbatim
        "x &#0; &#xD800; &#1114112; y": "x &#0; &#xD800; &#1114112; y",
        # not entities at all
        "a &# ; &#x; b": "a &# ; &#x; b",
    }
    df = spark.createDataFrame(
        [(k,) for k in cases], "h string"
    ).select("h", html_to_text("h").alias("t"))
    for r in df.collect():
        assert r.t == cases[r.h], (r.h, r.t)

    # decode_numeric_entities alone leaves &amp; untouched
    one = spark.range(1).select(
        decode_numeric_entities(F.lit("&amp; &#65;")).alias("v")
    ).first()
    assert one.v == "&amp; A"

    # still zero Python in the plan
    plan = (
        df.select(html_to_text("h"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_extract_tables(spark):
    from odin_rs_spark.operators.text import extract_tables

    html = (
        "<p>Real prose sentence here.</p>"
        "<table class='x'><tr><td>a &amp; b</td><th>h1</th></tr>"
        "<tr><td>c2</td></tr></table>"
        "mid prose"
        "<table><tr><td><b>bold</b> cell</td></tr></table>"
        "<script>var t = '<table><tr><td>never</td></tr></table>';</script>"
    )
    r = (
        spark.createDataFrame([(html,)], "h string")
        .select(extract_tables("h").alias("t"))
        .select("t.*")
        .first()
    )
    assert (r.n_tables, r.n_rows, r.n_cells) == (2, 3, 4)
    assert r.cells_text == "a & b|h1|c2|bold cell"
    assert r.prose_text == "Real prose sentence here. mid prose"

    # no tables: zero counts, full prose; zero Python in the plan
    df = spark.createDataFrame([("<p>just text</p>",)], "h string").select(
        extract_tables("h").alias("t")
    )
    r2 = df.select("t.*").first()
    assert (r2.n_tables, r2.n_cells, r2.prose_text) == (0, 0, "just text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_extract_main_text_blocks(spark):
    from odin_rs_spark.operators.text import extract_main_text

    html = (
        "<html><body>"
        "<div>nav <a href='/'>home</a> <a href='/a'>about us</a></div>"   # link-heavy -> drop
        "<p>This is the first real paragraph of prose, long enough.</p>"  # keep
        "<li>stub</li>"                                                   # short -> drop
        "<p>Second prose paragraph with a single <a href='/r'>ref</a> inside it.</p>"  # keep
        "<script>var x = 'this block never counts as a block of text';</script>"
        "</body></html>"
    )
    row = (
        spark.createDataFrame([(1, html)], "i long, h string")
        .select(extract_main_text("h").alias("m"))
        .first()
        .m
    )
    assert row.main_text == (
        "This is the first real paragraph of prose, long enough. "
        "Second prose paragraph with a single ref inside it."
    )
    assert row.n_kept == 2 and row.n_blocks >= 4
    # all-boilerplate document -> empty main text, zero kept
    nav = "<div><a href='/'>one</a> <a href='/b'>two</a> x</div>"
    r2 = (
        spark.createDataFrame([(1, nav)], "i long, h string")
        .select(extract_main_text("h").alias("m"))
        .first()
        .m
    )
    assert r2.main_text == "" and r2.n_kept == 0
    # zero Python in the plan
    df = spark.createDataFrame([(1, html)], "i long, h string")
    plan = (
        df.select(extract_main_text("h"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_gopher_quality_flags(spark):
    from odin_rs_spark.operators.text import gopher_quality_flags

    prose = ("the quick brown fox jumps over the lazy dog and runs away "
             "with all of them that have been here today ") * 3  # 60 words
    rows = [
        (1, prose),                                  # passes everything
        (2, "short text"),                           # fails word count
        (3, " ".join(["####"] * 60)),                # symbols, no alpha, no stops
        (4, prose + " " + "#" * 1 + " ..." * 20),    # symbol ratio pushed over
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert out[1].gopher_pass == 1 and out[1].n_stop_hits >= 2
    assert out[2].f_wordcount == 0 and out[2].gopher_pass == 0
    assert out[3].f_alpha == 0 and out[3].f_stop == 0 and out[3].f_symbol == 0
    r4 = out[4]
    assert r4.f_wordcount == 1 and r4.f_symbol == 0  # 21 syms vs 81 words
    assert r4.n_sym == 21
    # zero Python, zero shuffle
    plan = gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan
