"""Edge-case pins for pipeline/web.py (URL canonicalization + HTML
boilerplate strip) beyond what the p39/p40 oracles cover."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.pipeline.web import (
    canonicalize_url,
    html_extract_text,
    url_host,
)


def _one(spark, value, fn):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(fn(F.col("v")).alias("out")).first()["out"]


def test_canonicalize_url_cases(spark):
    cases = {
        # tracking params dropped, rest sorted, fragment gone
        "https://a.com/x?utm_campaign=c&z=1&a=2#top": "https://a.com/x?a=2&z=1",
        # www + default port + trailing slash
        "HTTP://WWW.A.COM:80/path/": "http://a.com/path",
        # non-default port kept
        "https://a.com:8443/x": "https://a.com:8443/x",
        # all params tracking -> no query marker at all
        "https://a.com/x?utm_source=s&gclid=g": "https://a.com/x",
        # path case preserved, host case folded
        "https://A.com/CaseSensitive": "https://a.com/CaseSensitive",
        # bare host, no path
        "https://www.a.com": "https://a.com",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, canonicalize_url) == want, raw


def test_url_host_cases(spark):
    assert _one(spark, "HTTPS://WWW.Sub.Example.COM:443/p?q=1", url_host) == "sub.example.com"
    assert _one(spark, "http://a.com:8080/", url_host) == "a.com:8080"


def test_html_extract_basic(spark):
    html = (
        "<html><head><title>T</title><script>if (a<b) {x}</script></head>"
        '<body><nav>menu</nav><p>Hello   <b>world</b> &amp; friends</p>'
        '<div class="ads">BUY</div><footer>legal</footer></body></html>'
    )
    assert _one(spark, html, html_extract_text) == "Hello world & friends"


def test_html_extract_malformed_keeps_text(spark):
    # unclosed tags / stray '<' must degrade to keeping text, not dropping it
    assert _one(spark, "<p>keep me", html_extract_text) == "keep me"
    assert _one(spark, "no tags at all", html_extract_text) == "no tags at all"


def test_html_entities_no_double_decode(spark):
    # "&amp;lt;" is the ESCAPED text "&lt;" -> must decode to "&lt;", not "<"
    assert _one(spark, "<p>&amp;lt;</p>", html_extract_text) == "&lt;"


def test_canonicalize_is_idempotent(spark):
    # canonical output must be a fixed point — dedup keys break if a
    # second normalization pass changes the key
    raws = [
        "HTTPS://WWW.Example7.COM:443/Path/33/?utm_source=feed&id=8&b=2&a=1#f",
        "http://a.com:8080/x?z=1&y=2",
        "https://sub.domain.org/deep/path/?gclid=g",
        "https://a.com",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "v string")
    once = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("v")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(c,) for c in once], "v string")
    twice = [
        r["c"]
        for r in df2.select(canonicalize_url(F.col("v")).alias("c")).collect()
    ]
    assert once == twice
