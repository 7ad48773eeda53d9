"""Micro-bench for the txlog suite alone: runs bench.bench_txlog N
times in one session and reports per-op minimums (the only number
comparable run-to-run on this time-variant box — see opt_bench.py).

Usage:
    python tools/txlog_bench.py            # min-of-3
    PASSES=5 python tools/txlog_bench.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_txlog  # noqa: E402
from novlake_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("PASSES", "3"))
    spark = get_session(
        "novlake-txlog-bench", master=f"local[{cpus}]", shuffle_partitions=8
    )
    runs = [bench_txlog(spark, sf_dir) for _ in range(passes)]
    mins = {k: min(r[k] for r in runs) for k in runs[0]}
    out = {"ops": mins, "total_min": round(sum(mins.values()), 3),
           "passes": passes,
           "totals_per_pass": [round(sum(r.values()), 3) for r in runs]}
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
