"""HTML → text extraction: the FIRST stage of every crawl-derived
training pipeline (SURVEY.md §2.L extension, round 5).

Real parsing, not regex: the stdlib ``html.parser`` tokenizer walks
tags with a skip-depth counter, so content inside boilerplate
containers (``script``/``style``/``nav``/``header``/``footer``/…)
is dropped STRUCTURALLY — nested markup, attributes containing
angle brackets, and unclosed tags are handled by the parser's own
error recovery, where a regex would corrupt. Character references
(``&amp;``, ``&#8212;``) decode to text via ``convert_charrefs``.

Cost model at 100 TB: extraction is per-document, zero-shuffle —
a Pandas UDF over Arrow batches (the classic "UDFs are the slow
path" exception: there is no JVM HTML parser in pyspark.sql.functions,
and the work is genuinely CPU-bound string parsing). One pass per
document, linear in bytes, no state across rows; plans keep a single
Python evaluation stage fused over the scan.

Cross-engine proof: :func:`wrap_documents_html` builds deterministic
pages around the fixture corpus JVM-side (with entity ESCAPING, so
arbitrary text survives the round-trip), and the graded key's DuckDB
oracle recovers the expected extraction by pure string concatenation
— a FULL hash-matched oracle for an HTML parser, which works exactly
because extract ∘ wrap == identity on the content channel while the
boilerplate channel must vanish.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: Content inside these containers never reaches the corpus: code,
#: styling, and site chrome. ``title`` is skipped too — it duplicates
#: the page's h1 in the synthesized pages and in most real sites.
_SKIP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "iframe", "svg",
        "nav", "header", "footer", "aside", "form", "button", "title",
    }
)

#: Void elements never push skip-depth (they cannot contain content,
#: and HTMLParser reports <br> etc. only via handle_startendtag for
#: XHTML-style or handle_starttag for bare form — a bare <input> inside
#: a skipped form must not unbalance the counter).
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS:
            self._skip += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and tag not in _VOID_TAGS and self._skip > 0:
            self._skip -= 1

    def handle_data(self, data: str) -> None:
        if self._skip == 0:
            d = data.strip()
            if d:
                self.parts.append(d)


def extract_text(page: str) -> str:
    """One HTML page → whitespace-normalized visible text.

    Text nodes outside skip containers, joined by single spaces, with
    all internal whitespace runs collapsed — the canonical form a
    dedup/quality stage wants (two pages differing only in indentation
    hash identically)."""
    p = _Extractor()
    p.feed(page)
    p.close()
    return " ".join(" ".join(p.parts).split())


def html_escape_col(c: Column) -> Column:
    """JVM-side entity escaping (&, <, > — the parse-breaking three),
    so wrap_documents_html survives arbitrary text content."""
    return F.replace(
        F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")),
        F.lit(">"),
        F.lit("&gt;"),
    )


def wrap_documents_html(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, …) → (doc_id, html): a deterministic
    page per document — head with title/style/script, site chrome
    (nav/header/footer), the document text as the main paragraph, and
    a trailing paragraph carrying named + numeric character references.
    Built entirely from ``concat`` (codegen, zero Python)."""
    esc = html_escape_col(F.col("text"))
    page = F.concat(
        F.lit(
            "<html><head><title>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>.m{color:red}</style>"
            "<script>var tracking = '<\\/div>';</script></head>"
            "<body><nav>Home | About | <a href='/login'>Login</a></nav>"
            "<header><img src=x.png>Example Site</header>"
            "<main><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        esc,
        F.lit(
            "</p><p>Contact: a &amp; b &#8212; end</p></main>"
            "<footer>&copy; 2026 Example <form><input name=q></form></footer>"
            "</body></html>"
        ),
    )
    return docs.select("doc_id", page.alias("html"))


def extract_html_text(df: DataFrame, col: str = "html") -> DataFrame:
    """(…, html) → (…, extracted): the distributed extraction pass.
    Arrow-batched Pandas UDF — per-row parse, constant memory, no
    shuffle introduced."""

    @F.pandas_udf(StringType())
    def run(pages: pd.Series) -> pd.Series:
        return pages.map(lambda s: extract_text(s) if s is not None else None)

    return df.withColumn("extracted", run(F.col(col)))


class _LinkCollector(HTMLParser):
    """Collects (href, anchor-text) pairs in document order — anchor
    text is every data node between <a> and its matching </a>
    (charrefs decoded, whitespace-normalized), nested-anchor-safe via
    the same depth discipline as :class:`_Extractor`."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._flush()
            self._href = dict(attrs).get("href")

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._parts.append(data)

    def _flush(self) -> None:
        if self._href is not None:
            self.links.append(
                (self._href, " ".join("".join(self._parts).split()))
            )
        self._href, self._parts = None, []


def extract_links(page: str) -> list[tuple[str, str]]:
    """One HTML page → ordered [(href, anchor_text)] — the crawl
    frontier/link-graph primitive (round 11)."""
    p = _LinkCollector()
    p.feed(page)
    p.close()
    p._flush()  # unclosed trailing <a>: keep what was collected
    return p.links


def extract_html_links(df: DataFrame, col: str = "html") -> DataFrame:
    """(…, html) → one row per anchor: (…, href, anchor). Arrow-batched
    parse emitting an array of structs, exploded JVM-side — the parse
    is per-document and shuffle-free; only (href, anchor) pairs leave
    the stage, never page bytes."""

    @F.pandas_udf("array<struct<href: string, anchor: string>>")
    def run(pages: pd.Series) -> pd.Series:
        return pages.map(
            lambda s: extract_links(s) if s is not None else []
        )

    return (
        df.withColumn("_l", F.explode(run(F.col(col))))
        .withColumn("href", F.col("_l.href"))
        .withColumn("anchor", F.col("_l.anchor"))
        .drop("_l", col)
    )


def wrap_documents_html_links(docs: DataFrame) -> DataFrame:
    """documents(doc_id, …) → (doc_id, html): deterministic pages whose
    OUTLINKS are pure doc_id arithmetic (hub d%7, next d+1, rel 3d%11)
    plus nav chrome with a non-/doc/ link the graph stage must exclude.
    The constructive-oracle twin of :func:`wrap_documents_html` for the
    link-graph key: extract_links ∘ wrap == the arithmetic edge list.
    Built entirely from ``concat`` (codegen, zero Python)."""
    d = F.col("doc_id")
    link = lambda target, label: F.concat(  # noqa: E731
        F.lit('<a href="/doc/'),
        target.cast("string"),
        F.lit('">' + label + " "),
        target.cast("string"),
        F.lit("</a>"),
    )
    page = F.concat(
        F.lit(
            "<html><head><title>Doc links</title></head><body>"
            '<nav><a href="/login">Login</a></nav><main><p>'
        ),
        link(d % 7, "hub"),
        F.lit(" "),
        link(d + 1, "next"),
        F.lit(" "),
        link((d * 3) % 11, "rel"),
        F.lit("</p></main></body></html>"),
    )
    return docs.select("doc_id", page.alias("html"))
