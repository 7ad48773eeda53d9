"""Round-8 late-key semantics: content-defined chunking (tiling,
locality, Python-spec parity) and hard-negative mining (label
inequality, numpy argmax parity)."""

import hashlib

import numpy as np
import pyspark.sql.functions as F


def _boundaries(text: str) -> list[int]:
    """The q_llm_cdc_chunks spec, restated in plain Python: position i
    (1-based) is a boundary iff int(md5(text[i-8:i])[:8], 16) % 64 == 0."""
    out = []
    for i in range(8, len(text) + 1):
        win = text[i - 8 : i].encode("utf-8")
        if int(hashlib.md5(win).hexdigest()[:8], 16) % 64 == 0:
            out.append(i)
    return out


def _chunks(text: str) -> list[tuple[int, int, str]]:
    """(start, length, sig) triples per the spec, tail chunk included."""
    cuts = _boundaries(text)
    spans, prev = [], 0
    for c in cuts:
        spans.append((prev + 1, c))
        prev = c
    if len(text) >= prev + 1:
        spans.append((prev + 1, len(text)))
    return [
        (s, e - s + 1, hashlib.md5(text[s - 1 : e].encode("utf-8")).hexdigest()[:8])
        for s, e in spans
    ]


def test_cdc_chunks_tile_every_document(spark, sf_small):
    """Conservation: per document the chunks partition [1..len] — the
    lengths sum to the doc length and starts are contiguous."""
    from novlake_spark.registry import queries

    rows = queries()["q_llm_cdc_chunks"](spark, sf_small).collect()
    docs = {
        r.doc_id: len(r.text)
        for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    }
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == {d for d, n in docs.items() if n > 0}
    for doc_id, ch in per_doc.items():
        ch.sort(key=lambda r: r.chunk_idx)
        assert ch[0].start_pos == 1
        for a, b in zip(ch, ch[1:]):
            assert b.start_pos == a.start_pos + a.chunk_len
        assert ch[-1].start_pos + ch[-1].chunk_len - 1 == docs[doc_id]


def test_cdc_spark_matches_python_spec(spark, sf_small):
    """Byte-for-byte parity with the hashlib restatement for the first
    ten documents — boundaries, lengths, and signatures."""
    from novlake_spark.registry import queries

    got = {}
    for r in (
        queries()["q_llm_cdc_chunks"](spark, sf_small)
        .filter(F.col("doc_id") < 10)
        .collect()
    ):
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.start_pos, r.chunk_len, r.chunk_sig))
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter(F.col("doc_id") < 10)
        .collect()
    }
    for doc_id, text in texts.items():
        expect = [
            (idx + 1, s, ln, sig) for idx, (s, ln, sig) in enumerate(_chunks(text))
        ]
        assert sorted(got[doc_id]) == expect


def test_cdc_locality_under_append():
    """The CDC selling point: appending a suffix leaves every chunk
    strictly before the last original boundary untouched (fixed-size
    blocking would shift everything after any INSERT; content-defined
    boundaries depend only on the trailing window). Pure spec test."""
    base = "the quick brown fox jumps over the lazy dog " * 40
    edited = base + "APPENDED TAIL CONTENT"
    a, b = _chunks(base), _chunks(edited)
    cuts_a = _boundaries(base)
    assert len(cuts_a) >= 2, "fixture text too short to exercise locality"
    shared = [c for c in a if c[0] + c[1] - 1 <= cuts_a[-1]]
    assert b[: len(shared)] == shared


def test_hard_negatives_label_inequality_and_argmax(spark, sf_small):
    """Every mined negative carries a different label than its query,
    and (neg_id, dot_i) equals the numpy brute-force argmax with
    lowest-id tie-break on the exact 1e-3 grid."""
    from novlake_spark.registry import queries

    got = {r.vec_id: (r.neg_id, r.dot_i) for r in queries()["q_llm_hard_negatives"](spark, sf_small).collect()}
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()
    grid = {
        r.vec_id: (
            r.label,
            np.floor(np.array(r.embedding, dtype=np.float64) * 1000 + 0.5).astype(np.int64),
        )
        for r in emb
    }
    for qid, (neg_id, dot_i) in got.items():
        qlabel, qv = grid[qid]
        assert grid[neg_id][0] != qlabel
        best = max(
            (int(qv @ cv), -cid)
            for cid, (clabel, cv) in grid.items()
            if clabel != qlabel
        )
        assert (dot_i, -neg_id) == best


def test_mix_temperature_rates_and_exact_selection(spark, sf_small):
    """Temperature flattening, checked two ways: (1) exact selection —
    every doc's membership reproduces from md5(doc_id) < floor(
    sqrt(n_min)/sqrt(n_lang)·2^32) in plain Python; (2) the policy —
    the smallest language keeps 100% and retention is monotone
    non-increasing in language size."""
    import hashlib
    import math

    from novlake_spark.registry import queries

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    n = {}
    for r in docs:
        n[r.lang] = n.get(r.lang, 0) + 1
    n_min = min(n.values())
    # math.sqrt is the correctly-rounded IEEE sqrt both engines use;
    # x**0.5 goes through libm pow and is NOT guaranteed identical
    thr = {
        lang: int(math.sqrt(n_min) / math.sqrt(c) * 4294967296)
        for lang, c in n.items()
    }
    expect = {
        r.doc_id
        for r in docs
        if int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) < thr[r.lang]
    }
    got = {r.doc_id for r in queries()["q_mix_temperature"](spark, sf_small).collect()}
    assert got == expect
    kept = {}
    for r in docs:
        kept.setdefault(r.lang, [0, 0])
        kept[r.lang][1] += 1
        if r.doc_id in got:
            kept[r.lang][0] += 1
    smallest = min(n, key=lambda k: (n[k], k))
    assert kept[smallest][0] == kept[smallest][1], "smallest stratum must keep 100%"
    by_size = sorted(n, key=n.get)
    rates = [kept[k][0] / kept[k][1] for k in by_size]
    # retention must trend down with stratum size; exact monotonicity is
    # up to hash noise, so compare smallest vs largest
    assert rates[0] >= rates[-1]


def test_cdc_dedup_matches_python_recomputation(spark, sf_small):
    """q_llm_cdc_dedup vs a hashlib recomputation over the full corpus:
    group every chunk's 16-hex digest, keep cross-document groups,
    compare (n_docs, n_copies, chars_saved) exactly. Also pins that at
    least one cross-doc duplicate chunk EXISTS in the fixture — a
    0-row pass would mean the key degenerated."""
    from novlake_spark.registry import queries

    got = {
        r.sig16: (r.chunk_len, r.n_docs, r.n_copies, r.chars_saved)
        for r in queries()["q_llm_cdc_dedup"](spark, sf_small).collect()
    }
    assert got, "fixture has no cross-document duplicate chunks?"
    groups = {}
    for r in spark.read.parquet(f"{sf_small}/documents.parquet").collect():
        for s, ln, _ in _chunks(r.text):
            body = r.text[s - 1 : s - 1 + ln]
            sig16 = hashlib.md5(body.encode("utf-8")).hexdigest()[:16]
            g = groups.setdefault((sig16, ln), [set(), 0])
            g[0].add(r.doc_id)
            g[1] += 1
    expect = {
        sig: (ln, len(docs), copies, (copies - 1) * ln)
        for (sig, ln), (docs, copies) in groups.items()
        if len(docs) >= 2
    }
    assert got == expect
