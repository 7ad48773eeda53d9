"""URL canonicalization (L42): rule-by-rule pins plus the plan shape."""

import pytest
from pyspark.sql import functions as F

from novlake_spark.operators.urls import canonical_url, registered_domain


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url(F.col("url")).alias("c")).first()["c"]


@pytest.mark.parametrize(
    "dirty,want",
    [
        # case normalization: scheme+host lower, path case preserved
        ("HTTP://WWW.Ex.COM/Path/X", "http://www.ex.com/Path/X"),
        # default ports drop, per scheme
        ("http://a.com:80/p", "http://a.com/p"),
        ("https://a.com:443/p", "https://a.com/p"),
        # NON-default ports kept — including http's 443 and https's 80
        ("http://a.com:8080/p", "http://a.com:8080/p"),
        ("http://a.com:443/p", "http://a.com:443/p"),
        ("https://a.com:80/p", "https://a.com:80/p"),
        # tracking params out, remainder sorted, empty query collapses
        ("http://a.com/p?utm_source=x&b=2&a=1", "http://a.com/p?a=1&b=2"),
        ("http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p"),
        # fragment dropped
        ("http://a.com/p?a=1#sec", "http://a.com/p?a=1"),
        # bare host, no path/query
        ("HTTPS://A.COM", "https://a.com"),
    ],
)
def test_canonical_rules(spark, dirty, want):
    assert _canon(spark, dirty) == want


def test_registered_domain(spark):
    rows = [
        ("www.example.com",), ("a.b.example.co.uk",), ("example.com",),
        ("localhost",), ("sub.shop.com.br",),
    ]
    df = spark.createDataFrame(rows, "host string")
    got = [r["d"] for r in df.select(registered_domain(F.col("host")).alias("d")).collect()]
    assert got == ["example.com", "example.co.uk", "example.com", "localhost", "shop.com.br"]


def test_canonical_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the property that makes
    it safe to run at any pipeline stage."""
    urls = [
        "HTTP://WWW.Ex.COM:80/Path?utm_x=1&z=2&a=3#f",
        "https://A.com:8443/q?b=1&a=2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("url"))
    assert [r["url"] for r in once.collect()] == [r["url"] for r in twice.collect()]


def test_canonical_plan_zero_python_zero_exchange(spark):
    """Scale shape: the canonicalizer is pure codegen — no Python eval,
    no shuffle."""
    df = spark.createDataFrame([("http://a.com/p?b=1&a=2",)], "url string")
    plan = (
        df.select(canonical_url(F.col("url")).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_robots_filter_semantics(spark):
    """Order-of-appearance rule semantics through the stdlib parser:
    Allow-before-Disallow admits, Disallow-prefix blocks, missing
    robots row yields NULL (unknown domain = decide upstream)."""
    urls = spark.createDataFrame(
        [
            (0, "http://a.com/Path/1", "a.com"),
            (1, "http://b.com/Path/2", "b.com"),
            (2, "http://b.com/private/x", "b.com"),
            (3, "http://c.com/anything", "c.com"),
        ],
        "id long, url string, domain string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /Path/\n"),
            ("b.com", "User-agent: *\nAllow: /Path/\nDisallow: /\n"),
        ],
        "domain string, robots_txt string",
    )
    from novlake_spark.operators.urls import robots_filter

    got = {r["id"]: r["allowed"] for r in robots_filter(urls, robots).collect()}
    assert got == {0: False, 1: True, 2: False, 3: None}


def test_robots_filter_plan_arrow_not_row(spark):
    """The politeness check is the Arrow path (pandas_udf), not a
    row-at-a-time Python UDF, and the per-domain side joins un-hinted."""
    urls = spark.createDataFrame([(0, "http://a.com/p", "a.com")], "id long, url string, domain string")
    robots = spark.createDataFrame([("a.com", "User-agent: *\n")], "domain string, robots_txt string")
    from novlake_spark.operators.urls import robots_filter

    plan = robots_filter(urls, robots)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_sitemap_parse_semantics(spark):
    """Namespace-aware parse, entity decoding inside loc, quarantine on
    malformed XML and on a non-urlset root, lastmod optional."""
    from novlake_spark.operators.urls import parse_sitemap_udf

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    good = (
        f'<?xml version="1.0"?><urlset {ns}>'
        "<url><loc>https://a.com/x?a=1&amp;b=2</loc>"
        "<lastmod>2026-01-01</lastmod></url>"
        "<url><loc> https://a.com/y </loc></url></urlset>"
    )
    bad = "<urlset><url><loc>unclosed"
    foreign = f"<sitemapindex {ns}><sitemap><loc>https://a.com/s.xml</loc></sitemap></sitemapindex>"
    df = spark.createDataFrame(
        [(0, good), (1, bad), (2, foreign), (3, None)], "id long, xml string"
    )
    parse = parse_sitemap_udf()
    out = {r["id"]: r["e"] for r in df.select("id", parse("xml").alias("e")).collect()}
    assert [tuple(e) for e in out[0]] == [
        ("https://a.com/x?a=1&b=2", "2026-01-01"),  # &amp; decoded by ET
        ("https://a.com/y", None),                   # whitespace stripped, lastmod optional
    ]
    assert out[1] is None and out[2] is None and out[3] is None


def test_sitemap_rejects_entity_expansion_bombs(spark):
    """ElementTree expands internal-DTD entities (measured: a 500-byte
    billion-laughs document inflates to 10^6+ chars before any node is
    visible) — the parser must quarantine ANY document declaring a DTD,
    including one hidden behind leading comments."""
    from novlake_spark.operators.urls import parse_sitemap_udf

    bomb = (
        '<?xml version="1.0"?>'
        + "<!-- " + "pad " * 2000 + "-->"
        + '<!DOCTYPE urlset [<!ENTITY a "xxxxxxxxxx">'
        + '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">'
        + '<!ENTITY c "&b;&b;&b;&b;&b;&b;&b;&b;&b;&b;">'
        + '<!ENTITY d "&c;&c;&c;&c;&c;&c;&c;&c;&c;&c;">]>'
        + '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "<url><loc>&d;</loc></url></urlset>"
    )
    ok = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.com/x</loc></url></urlset>"
    )
    df = spark.createDataFrame([(0, bomb), (1, ok)], "id long, xml string")
    parse = parse_sitemap_udf()
    out = {r["id"]: r["e"] for r in df.select("id", parse("xml").alias("e")).collect()}
    assert out[0] is None
    assert [e["loc"] for e in out[1]] == ["https://a.com/x"]
