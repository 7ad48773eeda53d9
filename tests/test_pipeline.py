"""End-to-end corpus curation: planted junk, exact dups, and near-dups
all removed; clean docs survive; output partitioned by language."""

import os

import pyspark.sql.functions as F
import pytest

from novlake_spark.pipelines import curate, drop_near_dups, quality_filter
from novlake_spark.sources.tables import load_table

GOOD = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD, "en", "src0", len(GOOD)),
        (1, GOOD, "en", "src1", len(GOOD)),                     # exact dup of 0
        (2, GOOD.replace("warm", "cold"), "en", "src2", len(GOOD)),  # near dup of 0
        (3, "too short", "en", "src3", 9),                      # quality: length
        (4, "spam spam spam spam spam spam spam spam spam spam", "en", "src4", 49),  # diversity
        (5, "a completely different clean document about distributed query engines and storage", "de", "src5", 82),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_quality_filter_drops_junk(corpus):
    kept = {r.doc_id for r in quality_filter(corpus).collect()}
    assert 3 not in kept and 4 not in kept
    assert {0, 1, 2, 5} <= kept


def test_near_dedup_keeps_lower_id(corpus):
    out = {r.doc_id for r in drop_near_dups(corpus, threshold=0.8).collect()}
    assert 0 in out and 2 not in out  # near-dup pair (0,2): higher id dropped


def test_full_curation(corpus, tmp_path, spark):
    path = str(tmp_path / "curated")
    curated, stats = curate(corpus, out_path=path, near_dup_threshold=0.8)
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {0, 5}
    assert stats.input_docs == 6
    assert stats.after_quality == 4
    assert stats.after_exact_dedup == 3
    assert stats.after_near_dedup == 2
    assert stats.total_tokens > 0
    assert any(d.startswith("lang=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == 2 and "n_tokens" in back.columns


def test_curation_on_fixture_corpus(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    curated, stats = curate(docs, near_dup_threshold=0.9)
    # fixture texts are byte-unique (no exact dups) but the small shared
    # vocabulary yields genuine token-set near-dups at jaccard >= 0.9 —
    # the near-dup stage finds and drops those
    assert stats.input_docs == 500
    assert stats.after_exact_dedup == stats.after_quality == 500
    assert stats.after_near_dedup < 500

    from novlake_spark.operators.dedup import near_dup_pairs

    losers = {r.id_b for r in near_dup_pairs(docs, threshold=0.9).select("id_b").distinct().collect()}
    assert stats.after_near_dedup == 500 - len(losers)


def test_ingest_crawl_feeds_curate(spark):
    """WARC bytes → ingest_crawl → curate: the full library path a user
    runs, end-to-end — robots drops a domain, the token floor drops a
    stub page, dedup collapses an exact duplicate."""
    import html as _html

    from novlake_spark.operators.warc import encode_warc_record
    from novlake_spark.pipelines import ingest_crawl

    def rec(i, host, words):
        page = f"<html><body><nav>x</nav><main><p>{_html.escape(words)}</p></main></body></html>"
        return encode_warc_record(
            f"HTTP://{host}/Doc/{i}?utm_s=1&a=2", 200,
            "text/html; charset=utf-8", page.encode(), record_id=f"urn:p:{i}",
        )

    body = "many solid words " * 8  # 24 tokens, passes the floor
    blob = (
        rec(0, "A.com", body.strip())
        + rec(1, "A.com", body.strip())          # exact duplicate text
        + rec(2, "Blocked.com", body.strip())    # robots-blocked domain
        + rec(3, "A.com", "too short")           # under the token floor
        + rec(4, "NoRobots.org", body.strip())   # domain with NO robots row
    )
    blobs = spark.createDataFrame([(0, bytearray(blob))], "blob_id long, warc binary")
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\n"), ("blocked.com", "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    # Default policy: a domain absent from the robots table is ADMITTED
    # (missing robots.txt = fetch allowed — the standard crawl rule).
    # ADVICE r5: the old bare filter on `allowed` dropped the NULLs
    # robots_filter deliberately emits for unknown domains.
    docs = ingest_crawl(blobs, robots=robots, min_tokens=20)
    got = docs.collect()
    assert {r["url"] for r in got} == {
        "http://a.com/Doc/0?a=2",
        "http://a.com/Doc/1?a=2",
        "http://norobots.org/Doc/4?a=2",
    }

    # strict opt-out: only domains with a KNOWN, permitting robots.txt
    strict = ingest_crawl(
        blobs, robots=robots, min_tokens=20, missing_robots_allowed=False
    )
    assert {r["url"] for r in strict.collect()} == {
        "http://a.com/Doc/0?a=2",
        "http://a.com/Doc/1?a=2",
    }
    assert all(r["domain"] == "a.com" for r in strict.collect())

    # exact dedup collapses the duplicate pair
    from novlake_spark.pipelines import drop_exact_dups

    with_ids = docs.withColumn(
        "doc_id", __import__("pyspark.sql.functions", fromlist=["xxhash64"]).xxhash64("url")
    )
    assert drop_exact_dups(with_ids).count() == 1


def test_ingest_crawl_pdf_route(spark):
    """Multi-format crawl (round 6): application/pdf response records
    route through the PDF text-layer reader (CMap'd pages included) and
    join the HTML documents in one pipeline; corrupt PDFs quarantine;
    the default HTML-only mode ignores PDFs unchanged."""
    import html as _html

    from novlake_spark.operators.pdftext import encode_pdf
    from novlake_spark.operators.warc import encode_warc_record
    from novlake_spark.pipelines import ingest_crawl

    body = "many solid words " * 8
    page = (
        f"<html><body><main><p>{_html.escape(body.strip())}</p></main></body></html>"
    )
    pdf_text = ("portable document words " * 6).strip()
    blob = (
        encode_warc_record("http://a.com/page", 200,
                           "text/html; charset=utf-8", page.encode(),
                           record_id="urn:m:0")
        + encode_warc_record("http://a.com/paper.pdf", 200,
                             "application/pdf",
                             encode_pdf([pdf_text], subset_font=True),
                             record_id="urn:m:1")
        + encode_warc_record("http://a.com/broken.pdf", 200,
                             "application/pdf", b"%PDF-corrupt",
                             record_id="urn:m:2")
    )
    blobs = spark.createDataFrame([(0, bytearray(blob))], "blob_id long, warc binary")

    got = {r.url: r.text for r in ingest_crawl(blobs, min_tokens=5, include_pdf=True).collect()}
    assert got["http://a.com/page"] == body.strip()
    assert got["http://a.com/paper.pdf"] == pdf_text
    assert "http://a.com/broken.pdf" not in got

    html_only = {r.url for r in ingest_crawl(blobs, min_tokens=5).collect()}
    assert html_only == {"http://a.com/page"}
