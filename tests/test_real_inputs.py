"""Real-input variants: robots.txt TEXT parser (R1) and the regex
real-HTML extractor (X1) — the swap-ins that let the engine crawl
non-synthetic content.  Small inline corpora, checked end-to-end through
the Spark operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix_spark.operators.extract import outlinks_html
from heritrix_spark.operators.robots import (
    disallowed_expr,
    join_rules,
    parse_robots_txt,
    rules_from_robots_texts,
    rules_per_host,
)

ROBOTS_A = """
# comments are stripped
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 2

User-agent: heritrix
Disallow: /no-heritrix
Crawl-delay: 1.5
"""

ROBOTS_ALLOW_ALL = """
User-agent: *
Disallow:
"""

ROBOTS_MULTI_AGENT = """
User-agent: googlebot
User-agent: heritrix
Disallow: /both
User-agent: *
Disallow: /
"""


def test_parse_robots_groups_and_delay():
    rules, delay = parse_robots_txt(ROBOTS_A, agent="heritrix")
    # the heritrix group wins over * (longer agent-token match)
    assert rules == [("/no-heritrix", False)]
    assert delay == 1500
    rules, delay = parse_robots_txt(ROBOTS_A, agent="otherbot")
    assert rules == [("/private", False), ("/private/ok", True)]
    assert delay == 2000


def test_parse_robots_empty_disallow_is_allow_all():
    rules, delay = parse_robots_txt(ROBOTS_ALLOW_ALL, agent="heritrix")
    assert rules == [("/", True)]
    assert delay is None


def test_parse_robots_shared_agent_group():
    rules, _ = parse_robots_txt(ROBOTS_MULTI_AGENT, agent="heritrix")
    assert rules == [("/both", False)]
    rules, _ = parse_robots_txt(ROBOTS_MULTI_AGENT, agent="unknown")
    assert rules == [("/", False)]


def test_rules_from_texts_feed_the_matcher(spark):
    """Parsed rules drive the same longest-prefix verdict the engine
    uses (R1 → R2 end-to-end)."""
    texts = spark.createDataFrame(
        [("a.test", ROBOTS_A), ("b.test", ROBOTS_ALLOW_ALL)],
        "host string, robots_txt string")
    rules = rules_from_robots_texts(texts, agent="otherbot")
    rows = {(r["host"], r["path_prefix"]): (r["allow"], r["crawl_delay_ms"])
            for r in rules.collect()}
    assert rows[("a.test", "/private")] == (False, 2000)
    assert rows[("a.test", "/private/ok")] == (True, 2000)
    assert rows[("b.test", "/")] == (True, None)

    batch = spark.createDataFrame(
        [("a.test", "/private/x"), ("a.test", "/private/ok/y"),
         ("a.test", "/pub"), ("b.test", "/anything")],
        "host string, path string")
    verdicts = {
        (r["host"], r["path"]): r["dis"]
        for r in join_rules(batch, rules_per_host(
            rules.where(F.col("path_prefix").isNotNull())))
        .select("host", "path",
                disallowed_expr(F.col("path"),
                                F.col("robots_rules")).alias("dis"))
        .collect()}
    assert verdicts[("a.test", "/private/x")] is True
    assert verdicts[("a.test", "/private/ok/y")] is False
    assert verdicts[("a.test", "/pub")] is False
    assert verdicts[("b.test", "/anything")] is False


HTML_PAGE = """
<html><head>
  <base href="http://base.test/dir/">
  <link rel="stylesheet" href="/style.css">
</head><body>
  <a href="http://abs.test/page1">one</a>
  <a href='relative.html'>two</a>
  <a href="/rooted">three</a>
  <a href="//proto.test/rel">four</a>
  <area href="map.html">
  <img src="pic.jpg">
  <iframe src="http://frame.test/f"></iframe>
  <table background="bg.gif"><tr><td>x</td></tr></table>
  <form action="/submit"><input type="text" name="q"></form>
  <script type="text/javascript">
    var u = "http://spec.test/api";
  </script>
</body></html>
"""


def test_outlinks_html_hops_and_resolution(spark):
    df = spark.createDataFrame(
        [("http://page.test/a/b.html", "L", HTML_PAGE)],
        "url string, hops_path string, html string")
    out = outlinks_html(df).select("url", "hop", "hops_path").collect()
    got = {(r["url"], r["hop"]) for r in out}
    assert got == {
        ("http://abs.test/page1", "L"),
        ("http://base.test/dir/relative.html", "L"),   # base-href dir
        ("http://base.test/rooted", "L"),              # site root
        ("http://proto.test/rel", "L"),                # scheme-relative
        ("http://base.test/dir/map.html", "L"),
        ("http://base.test/submit", "L"),              # form action
        ("http://base.test/dir/pic.jpg", "E"),
        ("http://frame.test/f", "E"),
        ("http://base.test/dir/bg.gif", "E"),
        ("http://base.test/style.css", "E"),           # <link href>
        ("http://spec.test/api", "X"),                 # script literal
    }
    assert all(r["hops_path"] == "L" + r["hop"] for r in out)


def test_outlinks_html_nofollow_and_no_base(spark):
    html = ('<html><head><meta name="robots" content="noindex,nofollow">'
            '</head><body><a href="x.html">x</a>'
            '<img src="y.png"></body></html>')
    df = spark.createDataFrame(
        [("http://h.test/", "", html)],
        "url string, hops_path string, html string")
    out = {(r["url"], r["hop"])
           for r in outlinks_html(df).select("url", "hop").collect()}
    # nofollow drops navlinks, keeps embeds; no <base> → resolve vs page
    assert out == {("http://h.test/y.png", "E")}


CSS_SHEET = """
/* comment with url(http://ignore.test/in-comment) kept — reference
   extracts from comments too (speculative) */
body { background: url('/img/bg.png'); }
.logo { background-image: url( "http://cdn.test/logo.svg" ); }
.rel { background: url(icons/dot.gif); }
@import "theme/extra.css";
@import url(http://fonts.test/f.css);
"""


def test_outlinks_css_resolution_and_hops(spark):
    from heritrix_spark.operators.extract import outlinks_css

    df = spark.createDataFrame(
        [("http://site.test/css/main.css", "LE", CSS_SHEET)],
        "url string, hops_path string, css string")
    out = outlinks_css(df).select("url", "hop", "hops_path").collect()
    got = {r["url"] for r in out}
    assert got == {
        "http://ignore.test/in-comment",      # comment url() (speculative)
        "http://site.test/img/bg.png",        # rooted
        "http://cdn.test/logo.svg",           # absolute, quoted+spaced
        "http://site.test/css/icons/dot.gif",  # relative to sheet dir
        "http://site.test/css/theme/extra.css",  # @import string form
        "http://fonts.test/f.css",            # @import url() form
    }
    assert all(r["hop"] == "E" and r["hops_path"] == "LEE" for r in out)


def test_outlinks_js_speculative(spark):
    from heritrix_spark.operators.extract import outlinks_js

    js = ('var a = "http://api.test/v1/data";\n'
          "fetch('https://cdn.test/bundle.js');\n"
          'var notaurl = "just a string";')
    df = spark.createDataFrame(
        [("http://site.test/app.js", "L", js)],
        "url string, hops_path string, js string")
    out = outlinks_js(df).select("url", "hop", "hops_path").collect()
    got = {r["url"] for r in out}
    assert got == {"http://api.test/v1/data", "https://cdn.test/bundle.js"}
    assert all(r["hop"] == "X" and r["hops_path"] == "LX" for r in out)


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://site.test/page/1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
      http://site.test/page/2
  </loc></url>
  <url><loc>/rooted/3</loc></url>
</urlset>
<feed><link href="entries/4.atom"/><link href="#frag-skipped"/></feed>
"""


def test_outlinks_xml_sitemap_locs_and_hrefs(spark):
    from heritrix_spark.operators.extract import outlinks_xml

    df = spark.createDataFrame(
        [("http://site.test/maps/sitemap.xml", "", SITEMAP_XML)],
        "url string, hops_path string, xml string")
    out = outlinks_xml(df).select("url", "hop", "hops_path").collect()
    got = {r["url"] for r in out}
    assert got == {
        "http://site.test/page/1",            # plain <loc>
        "http://site.test/page/2",            # whitespace-wrapped <loc>
        "http://site.test/rooted/3",          # rooted <loc> resolves
        "http://site.test/maps/entries/4.atom",  # href relative to sitemap
    }
    assert all(r["hop"] == "L" and r["hops_path"] == "L" for r in out)


def test_outlinks_uri_query_embedded(spark):
    from heritrix_spark.operators.extract import outlinks_uri

    rows = [
        # %-encoded absolute URL in a query value
        ("http://r.test/go?u=http%3A%2F%2Fdest.test%2Fp%3Fx%3D1&k=2", "L"),
        # bare absolute URL in a query value + non-URL values skipped
        ("http://r.test/out?next=https://other.test/a&x=abc&tel=tel:12", "LL"),
        # no query / no URL-shaped values → no links
        ("http://r.test/plain/page.html", "L"),
        ("http://r.test/q?a=1&b=two", "L"),
    ]
    df = spark.createDataFrame(rows, "url string, hops_path string")
    out = outlinks_uri(df).select("via", "url", "hop", "hops_path").collect()
    got = {(r["via"], r["url"]) for r in out}
    assert got == {
        ("http://r.test/go?u=http%3A%2F%2Fdest.test%2Fp%3Fx%3D1&k=2",
         "http://dest.test/p?x=1"),
        ("http://r.test/out?next=https://other.test/a&x=abc&tel=tel:12",
         "https://other.test/a"),
    }
    assert all(r["hop"] == "X" for r in out)
    assert {r["hops_path"] for r in out} == {"LX", "LLX"}


def test_outlinks_implied_rewrite(spark):
    from heritrix_spark.operators.extract import outlinks_implied

    rows = [
        ("http://img.test/thumb/123_t.jpg", "LE"),   # matches → implied full
        ("http://img.test/full/123.jpg", "LE"),      # no trigger match
    ]
    df = spark.createDataFrame(rows, "url string, hops_path string")
    out = outlinks_implied(
        df, trigger=r"/thumb/(\d+)_t\.jpg$", build=r"/full/$1.jpg"
    ).select("via", "url", "hop", "hops_path").collect()
    assert [(r["via"], r["url"], r["hop"], r["hops_path"]) for r in out] == [
        ("http://img.test/thumb/123_t.jpg",
         "http://img.test/full/123.jpg", "X", "LEX")]
