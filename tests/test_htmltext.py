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
