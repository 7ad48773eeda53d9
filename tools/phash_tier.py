"""Recall vs wall-time tiering for the IMAGE near-dup path (dHash +
Hamming LSH) — the image twin of tools/ann_tier.py (VERDICT r6 task
#8b: the text kNN tiers have quantitative quality evidence in
ANN_TIER.json; the phash path had only planted-pair unit tests).

Fixture: ``n_base`` deterministic gradient images, each with
``n_variants`` pixel-perturbed copies at increasing amplitude — the
realistic re-encode/resize-noise population an image dedup pass hunts.
Ground truth: EXACT Hamming pairs ≤ d over the collected 64-bit hashes,
one numpy XOR-popcount block (8 bytes/image — measurement apparatus
only; at 100 TB ground truth comes from a held-out sample, as in ANN
evaluation practice).

Measured per tier (num_bands ∈ {4, 8}, d ∈ {3, 6, 10}):
- recall: |found ∩ exact| / |exact| — found = phash_near_dup_pairs
  (Hamming LSH: 16-bit bands for num_bands=4, 8-bit for 8; pigeonhole
  guarantees recall 1.0 for d ≤ num_bands − 1, the rest depends on
  whether differing bits cluster into one band)
- precision is 1.0 BY CONSTRUCTION (every candidate is verified with
  JVM bit_count(xor) before emission), so it is asserted, not tabled
- sec: end-to-end Spark wall time (plan + collect)

Writes the ``phash`` section into ANN_TIER.json (text sections kept)
and prints a markdown table for SCALING.md §ANN.

Usage: python tools/phash_tier.py [n_base] [n_variants]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from novlake_spark.operators.multimodal import (
    encode_png,
    media_schema,
    phash_images,
    phash_near_dup_pairs,
)
from novlake_spark.session import get_session


def build_fixture(spark, n_base: int, n_variants: int):
    """Base gradient images + amplitude-ramped perturbed copies."""
    rows = []
    mid = 0
    for i in range(n_base):
        rng = np.random.RandomState(1000 + i)
        w, h = 32, 24
        base = (
            rng.randint(0, 96, size=(h, w, 3))
            + np.linspace(0, 159, w, dtype=int)[None, :, None]
        ).astype(np.uint8)
        rows.append((mid, "image", encode_png(base), (w, h, None, None, "png")))
        mid += 1
        for v in range(n_variants):
            amp = 4 + 4 * v  # ±4, ±8, ±12 … pixel noise
            r = np.random.RandomState(i * 97 + v)
            px = np.clip(
                base.astype(int) + r.randint(-amp, amp + 1, size=base.shape), 0, 255
            ).astype(np.uint8)
            rows.append((mid, "image", encode_png(px), (w, h, None, None, "png")))
            mid += 1
    return spark.createDataFrame(rows, media_schema)


def exact_pairs(ids: np.ndarray, hashes: np.ndarray, d: int) -> set[tuple[int, int]]:
    """All unordered pairs with Hamming(a, b) ≤ d — XOR + popcount on
    uint64 views, blocked outer product."""
    u = hashes.astype(np.uint64)
    out: set[tuple[int, int]] = set()
    block = 1024
    n = len(ids)
    for s in range(0, n, block):
        x = u[s : s + block, None] ^ u[None, :]
        ham = np.vectorize(lambda v: bin(int(v)).count("1"))(x)
        for bi, gi in zip(*np.where(ham <= d)):
            a, b = int(ids[s + bi]), int(ids[gi])
            if a < b:
                out.add((a, b))
    return out


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("phash-tier", master="local[32]", shuffle_partitions=32)
    media = build_fixture(spark, n_base, n_variants).cache()
    n = media.count()
    hashes_df = phash_images(media).cache()
    rows = hashes_df.collect()
    ids = np.array([r.media_id for r in rows])
    hs = np.array([r.dhash for r in rows], dtype=np.int64).view(np.uint64)
    print(f"n={n} images ({n_base} bases x {n_variants} variants)", flush=True)

    tiers = []
    for d in (3, 6, 10):
        t0 = time.perf_counter()
        truth = exact_pairs(ids, hs, d)
        t_exact = time.perf_counter() - t0
        for num_bands in (4, 8):
            t0 = time.perf_counter()
            found = {
                (r.id_a, r.id_b)
                for r in phash_near_dup_pairs(
                    hashes_df, max_distance=d, num_bands=num_bands
                ).collect()
            }
            sec = time.perf_counter() - t0
            assert found <= truth, "precision < 1 — verification is broken"
            recall = len(found & truth) / len(truth) if truth else 1.0
            guaranteed = d <= num_bands - 1
            tiers.append(
                {
                    "label": f"hamming-lsh bands={num_bands} d={d}",
                    "sec": round(sec, 2),
                    "recall": round(recall, 4),
                    "n_true_pairs": len(truth),
                    "guaranteed": guaranteed,
                }
            )
            if guaranteed:
                assert recall == 1.0, (d, num_bands, recall)
            print(
                f"bands={num_bands} d={d}: recall={recall:.4f} "
                f"({len(found)}/{len(truth)} pairs) {sec:.2f}s "
                f"[exact gt {t_exact:.2f}s]",
                flush=True,
            )

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN_TIER.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["phash"] = {
        "note": (
            "image near-dup recall vs wall-time: dHash-64 + Hamming LSH "
            "(phash_near_dup_pairs) against exact XOR-popcount pairs over "
            f"{n} planted-variant images; precision is 1.0 by construction "
            "(bit_count verify); 'guaranteed' = pigeonhole recall bound "
            "d <= bands-1 applies"
        ),
        "n": int(n),
        "tiers": tiers,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print("| tier | recall | sec |")
    print("|---|---|---|")
    for t in tiers:
        print(f"| {t['label']} | {t['recall']}{' (guaranteed)' if t['guaranteed'] else ''} | {t['sec']} |")
    spark.stop()


if __name__ == "__main__":
    main()
