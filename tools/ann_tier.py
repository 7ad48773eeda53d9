"""Recall@k vs wall-time tiering for the approximate-kNN operators.

VERDICT r3 stretch #9: the WEAK keys (q_llm_knn_lsh / q_llm_knn_ivf)
carry planted-pair unit tests but no quantitative quality evidence.
This harness measures, at a real scale (default: the sf1 rehearsal
fixtures from tools/gen_sf.py — 20k × 64-dim unit vectors):

- ground truth: exact cosine top-k per vector, computed DRIVER-SIDE in
  one numpy block matmul. This is measurement apparatus only (5 MB of
  vectors at sf1) — the production exact path is the blocked Spark
  join; at 100 TB ground truth would come from a held-out sample, the
  same way ANN papers evaluate.
- candidates: lsh_bucketed_knn over n_tables ∈ {1,2,4} (SRP,
  OR-amplification) and ivf_knn over n_probe ∈ {1,2,4} (k-means cells,
  multi-probe) — each timed end-to-end (Spark plan + collect) and
  scored as mean recall@k against the ground truth.

Output: a markdown table (pasted into SCALING.md §ANN) plus one JSON
line for machine diffing.

Usage: SF_DIR=/root/repo/.sfgen/sf1 python tools/ann_tier.py [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from novlake_spark.operators.knn import ivf_knn, lsh_bucketed_knn
from novlake_spark.session import get_session
from novlake_spark.sources.tables import load_table


def ground_truth(ids: np.ndarray, vecs: np.ndarray, k: int) -> dict[int, set[int]]:
    """Exact top-k by cosine (unit vectors → dot), block matmul."""
    n = len(ids)
    out: dict[int, set[int]] = {}
    block = 2048
    for s in range(0, n, block):
        scores = vecs[s : s + block] @ vecs.T  # (b, n)
        for i in range(scores.shape[0]):
            row = scores[i]
            row[s + i] = -np.inf  # exclude self
            top = np.argpartition(row, -k)[-k:]
            out[int(ids[s + i])] = {int(ids[j]) for j in top}
    return out


def recall_at_k(approx: dict[int, set[int]], exact: dict[int, set[int]], k: int) -> float:
    hits, total = 0, 0
    for a, truth in exact.items():
        hits += len(approx.get(a, set()) & truth)
        total += k
    return hits / total


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/repo/.sfgen/sf1")
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_session("ann-tier", master="local[32]", shuffle_partitions=32)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    n = len(ids)
    print(f"n={n} dim={vecs.shape[1]} k={k}", flush=True)

    t0 = time.perf_counter()
    exact = ground_truth(ids, vecs, k)
    t_exact = time.perf_counter() - t0
    print(f"ground truth (numpy, driver): {t_exact:.2f}s", flush=True)

    def run(label: str, df) -> dict:
        t0 = time.perf_counter()
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.a_id, set()).add(r.b_id)
        dt = time.perf_counter() - t0
        rec = recall_at_k(got, exact, k)
        cand = sum(len(v) for v in got.values()) / max(1, n)
        print(f"{label}: {dt:.2f}s recall@{k}={rec:.3f} cand/query={cand:.1f}", flush=True)
        return {"label": label, "sec": round(dt, 2), "recall": round(rec, 4)}

    results = []
    for t in (1, 2, 4):
        results.append(run(f"lsh planes=4 tables={t}", lsh_bucketed_knn(emb, k, n_planes=4, n_tables=t)))
    for p in (1, 2, 4):
        results.append(run(f"ivf cells=16 probe={p}", ivf_knn(emb, k, n_cells=16, n_probe=p)))
    # the cells axis (round 8): more/smaller cells shrink each probe's
    # candidate set — the probe count must scale with the cell count to
    # hold recall (classic IVF operating-curve behavior, worth one
    # measured pair so the trade is documented, not asserted)
    for p in (2, 4):
        results.append(run(f"ivf cells=32 probe={p}", ivf_knn(emb, k, n_cells=32, n_probe=p)))

    print("\n| method | wall (s) | recall@%d |" % k)
    print("|---|---|---|")
    for r in results:
        print(f"| {r['label']} | {r['sec']} | {r['recall']} |")
    print(json.dumps({"n": n, "k": k, "exact_numpy_sec": round(t_exact, 2), "tiers": results}))


if __name__ == "__main__":
    main()
