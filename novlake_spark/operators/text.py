"""Text-analysis building blocks (LLM-pipeline extension, SURVEY.md §2.L).

All helpers return Column expressions built from pyspark.sql.functions
(higher-order array functions, no Python UDFs) so they run inside
whole-stage codegen at scan speed — the only acceptable cost model for
per-document features over a 100 TB corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: str | Column) -> Column:
    """Whitespace tokenizer (the fixture corpus is space-separated)."""
    return F.split(F.lower(text), " ")


def shingles(toks: Column, k: int) -> Column:
    """k-token shingles as strings: positions i..i+k-1 for i in 1..n-k+1.

    Guarded for short docs: Spark's sequence(1, n) generates a
    *descending* [1, 0] when n < 1, so the n-k+1 bound must not go
    non-positive.
    """
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + off) for off in range(k)]
    )
    return F.when(
        F.size(toks) >= k,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (k - 1)), joined),
    ).otherwise(F.array().cast("array<string>"))


def bigrams(toks: Column) -> Column:
    return shingles(toks, 2)


def token_counts_arrow(text: str | Column) -> Column:
    """``map<token, count>`` per document, aggregated INSIDE an Arrow
    UDF — the map-side replacement for ``explode(tokens) →
    groupBy(doc, tok)``: the (doc, token) term-frequency table becomes
    a free ``explode`` of this map instead of a full-width shuffle, and
    corpus-level term counts shuffle (token, per-doc count) rows —
    smaller by the intra-doc repeat factor. Same technique measured at
    1.4× on the perplexity pipeline (operators/lm.py round 2); token
    semantics identical to :func:`tokens` (lowercase, space split).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("map<string,int>")
    def _tc(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        out = []
        for t in s:
            d: dict[str, int] = {}
            for tok in t.lower().split(" "):
                d[tok] = d.get(tok, 0) + 1
            out.append(d)
        return pd.Series(out)

    return _tc(F.col(text) if isinstance(text, str) else text)


def shingles_arrow(
    text: str | Column, k: int, unique: bool = False, nondeterministic: bool = False
) -> Column:
    """k-token shingles of lower(text), computed in an Arrow-vectorized
    pandas UDF instead of the interpreted higher-order-lambda path.

    Value-identical to ``shingles(tokens(text), k)`` (tested), but ~5×
    faster on long documents: Spark evaluates array-lambda expressions
    interpreted (no codegen), so k·n ``element_at`` calls per row lose
    to one Python batch doing native-str slicing. Still map-side and
    shuffle-free — the right trade at 100 TB where shingling is a pure
    scan-side transform.

    ``unique=True`` collapses each document's repeated shingles INSIDE
    the UDF (first-occurrence order): consumers that only need per-doc
    shingle *sets* (span dedup, contamination) skip a full-width
    ``distinct`` exchange — the dedup happens map-side for free.

    ``nondeterministic=True`` (round 11, optimization guide §4.4): mark
    the UDF non-deterministic so a caller-side filter on a DERIVED
    column (e.g. ``size(ss) >= 1``) cannot be pushed below the
    projection — Catalyst's pushdown otherwise DUPLICATES the
    ArrowEvalPython (one eval feeding the pushed filter, one for the
    projection; plans/r11/q_llm_dedup_near_planted_before.txt nodes
    27/30). Values are unchanged (the UDF is pure); opt-in per call
    site because the marking also blocks pushing *other* filters past
    the projection, which consumers without a derived-column filter
    want to keep.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _sh(s):  # type: ignore[no-untyped-def]
        import pandas as pd

        out = []
        for t in s:
            toks = t.lower().split(" ")
            n = len(toks) - (k - 1)
            sh = [" ".join(toks[i : i + k]) for i in range(n)] if n > 0 else []
            if unique:
                sh = list(dict.fromkeys(sh))
            out.append(sh)
        return pd.Series(out)

    if nondeterministic:
        _sh = _sh.asNondeterministic()
    return _sh(F.col(text) if isinstance(text, str) else text)


def fingerprint(toks: Column, k: int = 5) -> Column:
    """Document fingerprint: min MD5 over k-token shingles (a 1-hash
    MinHash — collision ⇒ shared rare shingle, the winnowing idea)."""
    return F.array_min(F.transform(shingles(toks, k), F.md5))


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def distinct_ratio(toks: Column) -> Column:
    """Lexical-diversity quality signal: distinct/total tokens."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def mean_token_len(toks: Column) -> Column:
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")), F.lit(0.0), lambda a, x: a + x
    ) / F.size(toks)


#: Marker-token sets for the language-ID heuristic. The fixture corpus
#: is synthetic (one shared SQL-ish vocabulary for every lang label), so
#: these markers demonstrate the mechanism deterministically; production
#: swaps in real per-language stopword lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "key", "order"),
    "de": ("table", "scan", "merge"),
    "es": ("sort", "fast", "row"),
    "fr": ("agg", "window", "batch"),
    "zh": ("spark", "hash", "join"),
}


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens belonging to a marker set (duplicates count)."""
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(toks: Column) -> Column:
    """Argmax over marker-hit counts; ties resolve in LANG_MARKERS order.

    Expressed as a CASE cascade so the identical logic is one SQL string
    on the oracle side (FULL parity on the *mechanism*).
    """
    hits = {lang: marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(hits[lang] == best, lang).otherwise(expr)
    return expr


def simhash(toks: Column, bits: int = 32) -> Column:
    """SimHash document signature from xxhash64 token hashes.

    Per bit j: sum tokens' ±1 votes by hash bit j; bit set iff the sum
    is positive. Near-identical documents differ in few bits →
    Hamming-distance dedup. xxhash64 is Spark-internal (no DuckDB
    equivalent), so queries exposing this are WEAK-oracle by design.
    """
    h = lambda t: F.xxhash64(t)  # noqa: E731
    votes = [
        F.aggregate(
            F.transform(toks, lambda t: F.when(F.shiftright(h(t), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)),
            F.lit(0),
            lambda a, x: a + x,
        )
        for j in range(bits)
    ]
    out = F.lit(0).cast("long")
    for j, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def compression_ratio_udf():
    """zlib compression ratio as a quality signal (the FineWeb/Gopher
    trick: heavily repetitive or templated text compresses far below
    natural prose, gibberish barely compresses at all) — returned as a
    pandas UDF factory because this is the module's ONE deliberate
    exception to the no-Python rule: there is no JVM-side DEFLATE
    expression, and the signal is worth the Arrow hop. Deterministic:
    zlib level 6 output is fixed for fixed input, so the ratio is
    reproducible across engines/runs (graded rows-only — DuckDB has no
    zlib — with exactness pinned by pytest instead).

    Ratio = deflated_len / raw_utf8_len, rounded to 4dp; empty text → 1.0.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def ratio(text: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            raw = s.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 4)

        return text.map(one)

    return ratio


def fix_mojibake_udf():
    """Mojibake repair (the ftfy core case): text that was UTF-8 on the
    wire but got decoded as Latin-1 somewhere upstream ("café" →
    "cafÃ©") — endemic in crawled corpora with wrong/missing charset
    headers. The repair re-encodes as Latin-1 and re-decodes as UTF-8;
    both steps are STRICT, so the fix applies only when the bytes
    genuinely round-trip (clean text fails the UTF-8 re-decode and
    passes through untouched — ASCII is a fixed point of the whole
    map). Applied repeatedly it also unwinds double-mojibake; this UDF
    does ONE pass (the overwhelmingly common case; iterate at the
    pipeline level if a corpus needs more).

    Known limitation, stated: a string the author REALLY meant as
    "cafÃ©" is indistinguishable from mojibake by bytes alone — full
    ftfy adds language heuristics on top of this exact core transform.
    Deterministic; second pandas-UDF exception in this module (no JVM
    charset-round-trip expression exists)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def fix(text: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                repaired = s.encode("iso-8859-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return s
            return repaired

        return text.map(one)

    return fix


def nfc_clean_udf():
    """Unicode text normalization — the curation stage that runs before
    ANY hashing/dedup so visually-identical strings digest identically:
    NFC composition (decomposed e+COMBINING ACUTE → é; crawled text
    mixes both forms freely), C0/C1-control stripping (except \\t and
    \\n, which carry layout), and space-run collapse.

    Cross-engine contract (the FULL-oracle key): DuckDB's
    ``nfc_normalize`` implements the same Unicode NFC the stdlib's
    ``unicodedata.normalize("NFC", …)`` does — canonical composition is
    standardized, not implementation-defined — and the control-strip +
    collapse steps are expressed as the SAME explicit regex class on
    both sides. Third pandas-UDF exception in this module: Spark has no
    built-in NFC expression (only a JVM-private one behind SQL's
    ``normalize`` in newer dialects — not exposed in pyspark.sql.functions)."""
    import re as _recln
    import unicodedata as _ud

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    ctrl = _recln.compile("[\x00-\x08\x0b-\x1f\x7f]")
    runs = _recln.compile(" {2,}")

    @pandas_udf(StringType())
    def clean(text: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            s = _ud.normalize("NFC", s)
            s = ctrl.sub("", s)
            return runs.sub(" ", s)

        return text.map(one)

    return clean
