"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Methodology (matches BASELINE.md): one shared SparkSession (cold JVM
start excluded from per-query numbers), one warm-up pass of the full
set (JIT + codegen compile), then one measured pass. Queries execute
via the ``noop`` sink so the entire plan runs without collect/driver
transfer skewing the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from novlake_spark.registry import queries
from novlake_spark.session import get_session

#: Representative slice of SURVEY.md §2: scan-bound agg, star join,
#: as-of, window, distinct, top-k, JSON, sessionization, text explode,
#: vector k-NN join, MinHash+LSH dedup.
HEADLINE = [
    "q_agg_groupby",
    "q_join_star",
    "q_join_asof",
    "q_win_cumsum",
    "q_agg_count_distinct",
    "q_topk_global",
    "q_json_extract",
    "q_stream_session",
    "q_llm_tf_topk",
    "q_llm_knn_join",
    "q_llm_dedup_near",
    "q_subquery_correlated",
    "q_pivot",
    "q_llm_tfidf",
    "q_udf_pandas",
    "q_scan_events_ts",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q18",
    "q_llm_perplexity",
    "q_sample_hash",
    "q_llm_contamination",
    "q_llm_seq_pack",
    "q_llm_span_dedup",
    "q_llm_pii_scrub",
    "q_multimodal_bytes",
]


def run_once(qs, spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for key in HEADLINE:
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[key] = round(time.perf_counter() - t0, 3)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_session("novlake-bench", master=f"local[{cpus}]", shuffle_partitions=8)
    qs = queries()
    run_once(qs, spark, sf_dir)  # warm-up: JIT, codegen, file listing
    a, b = run_once(qs, spark, sf_dir), run_once(qs, spark, sf_dir)
    times = {k: min(a[k], b[k]) for k in a}  # min-of-2 damps JIT/GC noise
    total = round(sum(times.values()), 3)
    print(json.dumps({"metric": "bench_total_warm", "value": total, "unit": "sec", "queries": times, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
