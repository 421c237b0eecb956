"""Round-9 operator unit tests: markdown extraction, feed scan,
mixture sampling — edge cases the catalog formulas don't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_markdown_edges(spark):
    from odin_rs_spark.operators.text import markdown_extract

    md = (
        "# Title\n"
        "pre ```inline\nfence``` post\n"
        "### Deep heading\n"
        "a [link **bold**](http://x/y?a=1) b\n"
        "![alt text](img.png)\n"
        "not#heading and #also not\n"
        "`code span` *emph* __under__"
    )
    r = spark.range(1).select(markdown_extract(F.lit(md)).alias("m")).first().m
    assert r.n_headings == 2          # '#' mid-line never counts
    assert r.n_fences == 1
    assert r.n_links == 2             # link + image
    assert "fence" not in r.prose_text and "inline" not in r.prose_text
    assert "link bold" in r.prose_text       # anchor kept, ** stripped
    assert "alt text" in r.prose_text
    assert "img.png" not in r.prose_text and "http://x" not in r.prose_text
    assert "code span" in r.prose_text and "emph" in r.prose_text
    # unclosed fence is NOT a fence (non-greedy pair pattern)
    r2 = spark.range(1).select(
        markdown_extract(F.lit("a ``` b")).alias("m")).first().m
    assert r2.n_fences == 0 and "b" in r2.prose_text


def test_feed_entries_both_dialects(spark):
    from odin_rs_spark.operators.web import feed_entries

    rss = (
        '<rss version="2.0"><channel><title>R &amp; D</title>'
        "<item><title>A</title><link>https://r/1</link>"
        "<pubDate>2026-01-02</pubDate></item>"
        "<item><title>B &lt;x&gt;</title><link>https://r/2</link>"
        "<pubDate>2026-01-03</pubDate></item></channel></rss>"
    )
    atom = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>AT</title>'
        '<entry><title>C</title><link href="https://a/9"/>'
        "<updated>2026-02-01</updated></entry></feed>"
    )
    df = spark.createDataFrame([(0, rss), (1, atom)], "id long, xml string")
    rows = sorted(
        feed_entries(df, "xml").collect(), key=lambda r: (r.id, r.link)
    )
    assert [r.kind for r in rows] == ["rss", "rss", "atom"]
    assert rows[0].feed_title == "R & D"          # entity decoded in JVM
    assert rows[1].title == "B <x>"
    assert rows[2].link == "https://a/9"          # attribute form
    assert rows[2].published == "2026-02-01"


def test_mixture_sample_deterministic_and_monotone(spark):
    from odin_rs_spark.operators.corpus import mixture_sample

    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )

    def weights(rates):
        return spark.createDataFrame(
            [(f"s{i}", r) for i, r in enumerate(rates)],
            "source string, rate_milli int",
        )

    lo = {r.doc_id for r in mixture_sample(docs, weights([300, 500, 0, 1000])).collect()}
    lo2 = {r.doc_id for r in mixture_sample(docs, weights([300, 500, 0, 1000])).collect()}
    assert lo == lo2                      # reproducible, no RNG state
    assert not any(d % 4 == 2 for d in lo)   # rate 0 keeps nothing
    assert sum(1 for d in lo if d % 4 == 3) == 100  # rate 1000 keeps all
    hi = {r.doc_id for r in mixture_sample(docs, weights([600, 500, 0, 1000])).collect()}
    assert lo <= hi                       # monotone: raising only ADDS
    # rate ~300/1000 keeps roughly 30% (md5 buckets are uniform)
    n0 = sum(1 for d in lo if d % 4 == 0)
    assert 15 <= n0 <= 45


def test_feed_dialect_by_root_element(spark):
    """An Atom feed whose TEXT mentions '<rss' must not misroute —
    dialect comes from the root element (r9 self-review)."""
    from odin_rs_spark.operators.web import feed_entries

    atom = (
        '<?xml version="1.0"?>'
        '<!-- migrated from <rss version="0.91"> on 2019-01-01 -->'
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<title>about &lt;rss&gt; feeds</title>"
        '<entry><title>T</title><link href="https://a/1"/>'
        "<updated>2026-01-01</updated></entry></feed>"
    )
    df = spark.createDataFrame([(0, atom)], "id long, xml string")
    rows = feed_entries(df, "xml").collect()
    assert rows and rows[0].kind == "atom" and rows[0].link == "https://a/1"


def test_politeness_unknown_host_defaults_to_zero_delay(spark):
    """A host with no Crawl-delay entry schedules at delay 0 — it must
    NOT vanish from the fetch plan (r9 self-review)."""
    from odin_rs_spark.operators.web import politeness_schedule

    urls = spark.createDataFrame(
        [("known.ex", "https://known.ex/a"), ("unknown.ex", "https://unknown.ex/b"),
         ("unknown.ex", "https://unknown.ex/c")],
        "host string, url string",
    )
    delays = spark.createDataFrame([("known.ex", 700)], "host string, delay_ms int")
    got = {r.url: (r.delay_ms, r.fetch_ms) for r in
           politeness_schedule(urls, delays).collect()}
    assert got["https://known.ex/a"] == (700, 0)
    assert got["https://unknown.ex/b"] == (0, 0)
    assert got["https://unknown.ex/c"] == (0, 0)


def test_mixture_sample_unknown_domain_handling(spark):
    """Unknown domains drop by default (weights DEFINE the corpus) or
    keep at an explicit default rate — never a silent surprise."""
    from odin_rs_spark.operators.corpus import mixture_sample

    docs = spark.createDataFrame(
        [(i, "known" if i % 2 == 0 else "mystery") for i in range(100)],
        "doc_id long, source string",
    )
    w = spark.createDataFrame([("known", 1000)], "source string, rate_milli int")
    dropped = mixture_sample(docs, w).collect()
    assert all(r.source == "known" for r in dropped) and len(dropped) == 50
    kept = mixture_sample(docs, w, default_rate_milli=1000).collect()
    assert len(kept) == 100


def test_xlsx_attribute_order_and_absolute_targets(spark):
    """Cells with s=/t= before r= parse; package-absolute rel targets
    ('/xl/worksheets/…') resolve (r9 self-review bugs, both real)."""
    import io
    import zipfile

    from odin_rs_spark.sources.officedoc import encode_xlsx, parse_xlsx_cells

    wb = encode_xlsx([("S", [["a", 3]])])
    zf = zipfile.ZipFile(io.BytesIO(wb))
    sheet = zf.read("xl/worksheets/sheet1.xml")
    sheet = sheet.replace(b'<c r="A1" t="s">', b'<c s="0" t="s" r="A1">')
    rels = zf.read("xl/_rels/workbook.xml.rels").replace(
        b'Target="worksheets/sheet1.xml"', b'Target="/xl/worksheets/sheet1.xml"'
    )
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as z2:
        for n in zf.namelist():
            data = {"xl/worksheets/sheet1.xml": sheet,
                    "xl/_rels/workbook.xml.rels": rels}.get(n, zf.read(n))
            z2.writestr(n, data)
    cells = parse_xlsx_cells(out.getvalue())
    got = {(c["row"], c["col"]): (c["celltype"], c["value"]) for c in cells}
    assert got[(1, 1)] == ("s", "a") and got[(1, 2)] == ("n", "3")
