"""Recall tiering for the product-quantization path (q_emb_pq_encode)
— the PQ sibling of tools/ann_tier.py (text kNN) and tools/phash_tier.py
(image near-dup): every approximate path in the repo carries measured
recall evidence, and round 8 added the PQ encode, so this closes its
quality gap.

What is measured: recall@k of ADC search (asymmetric distance
computation — query stays full-precision, base vectors are reduced to
their per-subspace code's centroid; Jégou et al., PAMI'11 §IV) against
exact numpy dot-product ground truth, on the same clustered fixture the
IVF/LSH tiers use. Tiers vary the codebook:

- ``formula M=8 K=16`` — the GRADED key's deterministic integer
  codebook. Its job is to make the ENCODE step cross-engine
  hash-exact; it is data-oblivious, so its retrieval recall is the
  honest floor and quantifies how much codebook TRAINING matters.
- ``kmeans M=8 K=16 / K=256`` and ``kmeans M=16 K=256`` — per-subspace
  k-means codebooks (numpy Lloyd iterations — measurement apparatus,
  like the exact ground truth; in production the trained codebook is
  engine-specific state exactly like IVF centroids, while the encode
  semantics stay the graded, engine-exact argmin).

Writes the ``pq`` section into ANN_TIER.json (other sections kept) and
prints a markdown table.

Usage: SF_DIR=/root/repo/.sfgen/sf1 python tools/pq_tier.py [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.ann_tier import ground_truth, recall_at_k  # noqa: E402


def formula_codebook(m: int, k: int, dim: int) -> np.ndarray:
    """The graded key's deterministic codebook on the same 1e-3 grid
    as the data (cb ints are grid units)."""
    sub = dim // m
    cb = np.zeros((m, k, sub))
    for ki in range(k):
        for p in range(dim):
            cb[p // sub, ki, p % sub] = (((ki * 1231 + p * 337 + 911) % 2001) - 1000) / 1000.0
    return cb


def kmeans_codebooks(vecs: np.ndarray, m: int, k: int, iters: int = 12) -> np.ndarray:
    """Per-subspace Lloyd k-means. Deterministic init (strided sample)."""
    n, dim = vecs.shape
    sub = dim // m
    cbs = np.zeros((m, k, sub))
    for mi in range(m):
        x = vecs[:, mi * sub : (mi + 1) * sub]
        c = x[:: max(1, n // k)][:k].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for ki in range(k):
                mask = assign == ki
                if mask.any():
                    c[ki] = x[mask].mean(axis=0)
        cbs[mi] = c
    return cbs


def encode(vecs: np.ndarray, cbs: np.ndarray) -> np.ndarray:
    """(n, M) argmin codes — the q_emb_pq_encode semantics."""
    m, k, sub = cbs.shape
    codes = np.zeros((len(vecs), m), dtype=np.int32)
    for mi in range(m):
        x = vecs[:, mi * sub : (mi + 1) * sub]
        d = ((x[:, None, :] - cbs[mi][None, :, :]) ** 2).sum(axis=2)
        codes[:, mi] = d.argmin(axis=1)
    return codes


def adc_topk(
    vecs: np.ndarray,
    ids: np.ndarray,
    cbs: np.ndarray,
    codes: np.ndarray,
    k: int,
    rerank: int = 1,
):
    """ADC search, every vector as query: approx dot = Σ_m q_m·c[code].
    Blocked so the (block × n) score matrix stays small. ``rerank`` > 1
    is the production IVF-PQ pattern: take k·rerank candidates by ADC,
    score THOSE exactly against the full-precision query, keep top-k —
    the exact pass touches only the candidate list, never the corpus."""
    m, kk, sub = cbs.shape
    n = len(vecs)
    cand = min(n - 1, k * rerank)
    out: dict[int, set[int]] = {}
    for lo in range(0, n, 1024):
        hi = min(n, lo + 1024)
        scores = np.zeros((hi - lo, n), dtype=np.float32)
        for mi in range(m):
            q = vecs[lo:hi, mi * sub : (mi + 1) * sub]
            lut = q @ cbs[mi].T  # (block, K)
            scores += lut[:, codes[:, mi]]
        for r in range(hi - lo):
            scores[r, lo + r] = -np.inf  # exclude self
            top = np.argpartition(scores[r], -cand)[-cand:]
            if rerank > 1:
                ex = vecs[top] @ vecs[lo + r]
                top = top[np.argpartition(ex, -k)[-k:]]
            out[int(ids[lo + r])] = {int(ids[t]) for t in top}
    return out


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/repo/.sfgen/sf1")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import duckdb

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    ).fetchall() if os.path.isdir(f"{sf_dir}/embeddings.parquet") else duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    vecs = np.array([r[1] for r in emb], dtype=np.float64)
    # the graded grid: PQ operates on what the engines hash
    vecs = np.floor(vecs * 1000 + 0.5) / 1000.0
    n, dim = vecs.shape
    print(f"n={n} dim={dim} k={k}", flush=True)

    t0 = time.perf_counter()
    exact = ground_truth(ids, vecs, k)
    t_exact = time.perf_counter() - t0
    print(f"exact ground truth: {t_exact:.2f}s", flush=True)

    results = []

    def run(label: str, cbs: np.ndarray, rerank: int = 1) -> None:
        t0 = time.perf_counter()
        codes = encode(vecs, cbs)
        approx = adc_topk(vecs, ids, cbs, codes, k, rerank=rerank)
        dt = time.perf_counter() - t0
        rec = recall_at_k(approx, exact, k)
        # K<=16 codes are 4-bit nibbles (0.5 B/subvector — the
        # q_emb_pq_encode docstring's "8 nibbles" = 4 B at M=8),
        # K<=256 one byte, else two (ADVICE r8: the old formula
        # overstated K=16 compression 2x)
        k_codes = cbs.shape[1]
        bytes_per_vec = cbs.shape[0] * (
            0.5 if k_codes <= 16 else 1 if k_codes <= 256 else 2
        )
        print(
            f"{label}: {dt:.2f}s recall@{k}={rec:.3f} ({bytes_per_vec:g} B/vec vs {dim * 4} B raw)",
            flush=True,
        )
        results.append({"label": label, "sec": round(dt, 2), "recall": round(rec, 4)})

    run("formula M=8 K=16", formula_codebook(8, 16, dim))
    km8_16 = kmeans_codebooks(vecs, 8, 16)
    run("kmeans M=8 K=16", km8_16)
    km8_256 = kmeans_codebooks(vecs, 8, 256)
    run("kmeans M=8 K=256", km8_256)
    km16_256 = kmeans_codebooks(vecs, 16, 256)
    run("kmeans M=16 K=256", km16_256)
    # the production operating point: ADC is the cheap FILTER, exact
    # rerank of k·R candidates is the quality restorer (Jégou §V) —
    # the exact pass reads R·k full vectors per query, not the corpus
    run("kmeans M=8 K=256 + rerank50", km8_256, rerank=50)
    run("kmeans M=16 K=256 + rerank50", km16_256, rerank=50)

    print("\n| codebook | wall (s) | recall@%d |" % k)
    print("|---|---|---|")
    for r in results:
        print(f"| {r['label']} | {r['sec']} | {r['recall']} |")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN_TIER.json")
    with open(path) as f:
        doc = json.load(f)
    doc["pq"] = {"n": n, "k": k, "exact_numpy_sec": round(t_exact, 2), "tiers": results}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path} [pq]")


if __name__ == "__main__":
    main()
