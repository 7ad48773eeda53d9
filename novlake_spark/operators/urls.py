"""URL canonicalization (crawl-pipeline extension, round 5).

Dedup by URL is the cheapest dedup a crawl pipeline runs — BEFORE
fetching, before text extraction — and it only works if equivalent
URLs map to one canonical form. The canonicalizer below is pure
``pyspark.sql.functions`` (parse_url + array HOFs — JVM codegen, zero
Python), applying the standard equivalence rules:

- scheme and host lowercase (RFC 3986 §6.2.2.1 case normalization);
  path case is PRESERVED (paths are case-sensitive);
- default ports dropped (``http:80``, ``https:443``), explicit
  non-default ports kept;
- tracking parameters (``utm_*``) removed;
- remaining query parameters SORTED (order-insensitive equivalence —
  the normalization that merges ``?a=1&b=2`` with ``?b=2&a=1``);
- fragment dropped (never sent to the server).

At 100 TB this runs at scan speed inside whole-stage codegen and
FEEDS the exact-dedup digest — canonicalize, then md5, then the L1
machinery; no extra shuffle of its own.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Dirty URL → canonical form, entirely JVM-side."""
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    authority = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != F.lit(""))
        & ~((proto == F.lit("http")) & (port == F.lit("80")))
        & ~((proto == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.startswith("utm_"),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(sorted_q != F.lit(""), F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )


def registered_domain(host: Column, tlds: tuple[str, ...] = ("co.uk", "com.br")) -> Column:
    """Host → registered domain: last two labels, or last three when the
    public suffix itself has two labels (a bounded, explicit suffix list
    — the real PSL is a data file; the MECHANISM is what matters here).
    ``www.a.example.co.uk`` → ``example.co.uk``; ``www.example.com`` →
    ``example.com``."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_two_label_suffix = last2.isin(*tlds)
    return (
        F.when(n <= 2, host)
        .when(is_two_label_suffix & (n >= 3), last3)
        .otherwise(last2)
    )


def robots_filter(
    urls: DataFrame, robots: DataFrame, agent: str = "*"
) -> DataFrame:
    """Crawl-politeness filter: join each URL with its domain's
    robots.txt and evaluate ``can_fetch`` with the stdlib parser
    (urllib.robotparser — real Allow/Disallow order-of-appearance
    semantics, not a prefix regex).

    ``urls``: (…, url, domain); ``robots``: (domain, robots_txt).
    Output adds an ``allowed`` boolean.

    Scale notes: the robots side is per-DOMAIN — bounded by the crawl
    frontier's distinct-domain count, orders of magnitude smaller than
    the URL side, so AQE broadcasts it from size estimates (no hint —
    repo policy: hints only on provably-bounded sides). Inside the
    Arrow batch the parsed RobotFileParser is MEMOIZED per distinct
    robots text, so a million URLs from one domain parse its rules
    once per batch, not per row."""
    import urllib.robotparser as _rp

    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def can_fetch(robots_txt: pd.Series, url: pd.Series) -> pd.Series:
        cache: dict[str, _rp.RobotFileParser] = {}

        def one(txt: str | None, u: str | None):
            if txt is None or u is None:
                return None
            p = cache.get(txt)
            if p is None:
                p = _rp.RobotFileParser()
                p.parse(txt.splitlines())
                cache[txt] = p
            return p.can_fetch(agent, u)

        return pd.Series([one(t, u) for t, u in zip(robots_txt, url)])

    joined = urls.join(robots, "domain", "left")
    return joined.withColumn("allowed", can_fetch(F.col("robots_txt"), F.col("url")))


def parse_sitemap_udf():
    """Sitemap XML → URL entries: the crawl frontier's seed list, parsed
    with the stdlib ElementTree (real namespace-aware XML, not regex —
    CDATA, entity refs and attribute noise are the parser's problem).

    Returns a pandas UDF mapping one sitemap document to an array of
    (loc, lastmod) structs; malformed XML yields NULL (quarantine).
    Explode downstream and the frontier is rows again. Per-document
    parse, zero shuffle, Arrow-batched — the XML twin of the HTML
    extraction path."""
    import xml.etree.ElementTree as _ET

    from pyspark.sql.functions import pandas_udf

    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

    @pandas_udf("array<struct<loc:string,lastmod:string>>")
    def parse(xml_text: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            # Resource-bomb guard (same contract as the codec family):
            # ElementTree EXPANDS internal-DTD entities, so a 500-byte
            # billion-laughs document inflates to 10^6+ chars before
            # any node is seen (measured). Legitimate sitemaps never
            # carry a DTD — quarantine any document that declares one.
            if "<!DOCTYPE" in s or "<!ENTITY" in s:  # full scan: a DTD
                return None  # can hide behind arbitrary leading comments
            try:
                root = _ET.fromstring(s)
            except _ET.ParseError:
                return None
            if root.tag != f"{ns}urlset":
                return None
            out = []
            for u in root.findall(f"{ns}url"):
                loc = u.find(f"{ns}loc")
                lastmod = u.find(f"{ns}lastmod")
                if loc is not None and loc.text:
                    out.append(
                        {
                            "loc": loc.text.strip(),
                            "lastmod": lastmod.text.strip()
                            if lastmod is not None and lastmod.text
                            else None,
                        }
                    )
            return out

        return xml_text.map(one)

    return parse
