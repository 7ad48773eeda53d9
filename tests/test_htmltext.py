"""HTML → text extraction (L41): parser semantics, boilerplate
suppression, entity decoding, malformed-input recovery, and the
Spark wrap→extract inversion the FULL oracle relies on."""

import pytest

from novlake_spark.operators.htmltext import (
    extract_html_text,
    extract_text,
    wrap_documents_html,
)


def test_boilerplate_suppressed_structurally():
    page = (
        "<body><nav>Home | <a href='/x'>About</a></nav>"
        "<header>Site</header><main><p>keep me</p></main>"
        "<footer>legal<form><input name=q>search</form></footer></body>"
    )
    assert extract_text(page) == "keep me"


def test_entities_and_charrefs_decode():
    assert extract_text("<p>a &amp; b &#8212; c &lt;tag&gt;</p>") == "a & b — c <tag>"


def test_nested_and_sibling_skips():
    # skip containers nest: inner end tag must not unlock the outer
    assert extract_text("<footer><nav>x</nav>y</footer>z") == "z"
    # and an end tag without a start must not underflow the counter
    assert extract_text("</nav>a<script>b</script>c") == "a c"


def test_void_tags_inside_skips_do_not_unbalance():
    # <input>/<img>/<br> never push depth — a form full of them still
    # suppresses its text and releases at </form>
    page = "<form><input name=a><br><img src=x>hidden</form>visible"
    assert extract_text(page) == "visible"


def test_script_with_markup_in_string_literal():
    # the classic regex-killer: markup inside a JS string; html.parser's
    # CDATA mode keeps everything until the real </script>
    page = "<p>a</p><script>var s = '<p>not text</p>';</script><p>b</p>"
    assert extract_text(page) == "a b"


def test_whitespace_normalization():
    assert extract_text("<p>  a\n\t b </p>\n <p>c</p>") == "a b c"


def test_malformed_recovery_never_raises():
    for junk in (
        "", "<", "<<<>>>", "<p", "<p attr='unclosed", "a<b>c",
        "<nav>unclosed suppresses the rest", "&#xZZ; &unknown; ok",
        "\x00binary\xff<p>x</p>",
    ):
        extract_text(junk)  # must not raise
    assert extract_text("a<b>c") == "ac" or extract_text("a<b>c") == "a c"


def test_wrap_extract_inversion_spark(spark):
    """The oracle's premise, pinned locally: extract(wrap(text)) ==
    'Doc {id} {text} Contact: a & b — end' — including for text that
    needs entity escaping (& < >), which the fixtures never exercise."""
    rows = [
        (0, "alpha beta gamma"),
        (1, "cats & dogs <b>not markup</b> 1 > 0"),
        (2, "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["extracted"]
        for r in extract_html_text(wrap_documents_html(docs)).collect()
    }
    for i, text in rows:
        assert out[i] == f"Doc {i} {text} Contact: a & b — end"


def test_extract_plan_single_python_stage(spark):
    """Scale shape: wrap is pure codegen concat; extraction adds exactly
    one Arrow-batched Python eval and no Exchange."""
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    plan = extract_html_text(wrap_documents_html(docs))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time path would be the slow UDF


# ---- link collection (L74/L75, round 11) ----------------------------

from novlake_spark.operators.htmltext import extract_links  # noqa: E402


def test_links_basic_order_and_text():
    page = '<a href="/a">first</a> x <a href="/b">second link</a>'
    assert extract_links(page) == [("/a", "first"), ("/b", "second link")]


def test_links_anchor_text_normalized_and_decoded():
    page = '<a href="/x">a &amp;\n\t b &#8212; c</a>'
    assert extract_links(page) == [("/x", "a & b — c")]


def test_links_nested_markup_inside_anchor():
    # data nodes between <a> and </a> all count, tags don't
    page = '<a href="/x">bold <b>middle</b> end</a>'
    assert extract_links(page) == [("/x", "bold middle end")]


def test_links_missing_href_skipped():
    # an <a> with no href is an anchor point, not a link
    page = '<a name="top">not a link</a><a href="/y">yes</a>'
    assert extract_links(page) == [("/y", "yes")]


def test_links_unclosed_start_flushes_on_next_anchor():
    # a new <a> implicitly terminates the previous one (browser-like),
    # and a trailing unclosed <a> is kept with what was collected
    page = '<a href="/a">one<a href="/b">two'
    assert extract_links(page) == [("/a", "one"), ("/b", "two")]


def test_links_empty_href_and_empty_text():
    assert extract_links('<a href="">x</a>') == [("", "x")]
    assert extract_links('<a href="/e"></a>') == [("/e", "")]


def test_links_malformed_never_raises():
    for junk in ("", "<a", "<a href", "</a></a>", "<a href='/u'>u",
                 "\x00<a href='/v'>v</a>\xff"):
        extract_links(junk)  # must not raise
