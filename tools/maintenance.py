"""One-shot table maintenance: the job you schedule nightly per
transaction-logged table. Runs, in dependency order:

0. ``fsck``          — REPORT dangling file references (repair is a
   human decision: it acknowledges data loss)
1. ``checkpoint``    — fold the log so reads stay O(1 + tail)
2. ``compact``       — merge small files (streaming-sink dribble)
3. ``reorg``         — materialize heavy deletion vectors away
4. ``analyze``       — retrofit missing stats / requested Bloom filters
5. ``clean_log``     — drop entries below the retention horizon
6. ``vacuum``        — delete unreferenced data files past retention

and prints ONE JSON report of what each step did. Every step is an
atomic commit (or metadata-only), so the job is safe to run while
writers are live — a conflicting concurrent commit surfaces as a
skipped step in the report, not a corrupted table.

Usage:
    python tools/maintenance.py /path/to/table [--keep 10]
        [--small-file-mb 32] [--dv-ratio 0.1] [--bloom col1,col2]
        [--retain-hours 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from novlake_spark.session import get_session  # noqa: E402
from novlake_spark.txlog import CommitConflict, TxTable  # noqa: E402


def maintain(
    spark,
    path: str,
    keep_versions: int = 10,
    small_file_mb: float = 32.0,
    dv_ratio: float = 0.1,
    bloom_cols: list[str] | None = None,
    retain_ms: int = 3_600_000,
) -> dict:
    """Run the maintenance sequence; returns the per-step report.
    Importable so tests (and schedulers embedding Spark) can call it
    without a subprocess."""
    t = TxTable(spark, path)
    report: dict = {"path": path, "before": t.detail()}

    def step(name, fn):
        try:
            report[name] = fn()
        except CommitConflict as exc:  # a live writer won; try next run
            report[name] = f"skipped: {exc}"

    step("fsck", lambda: t.fsck())  # report-only: dangling refs need a human call
    step("checkpoint", lambda: t.checkpoint())
    step("compact_small", lambda: t.compact(small_file_mb=small_file_mb))
    step("reorg_dv", lambda: t.reorg(min_dv_ratio=dv_ratio))
    step("analyze", lambda: t.analyze(bloom_cols=bloom_cols))
    latest = t.latest_version() or 0
    horizon = max(0, latest - keep_versions)
    # clean_log needs a checkpoint at/below the horizon; best-effort
    try:
        if horizon > 0 and any(c <= horizon for c in t.checkpoints()):
            report["clean_log"] = t.clean_log(horizon)
        else:
            report["clean_log"] = []
    except ValueError as exc:
        report["clean_log"] = f"skipped: {exc}"
    report["vacuum"] = t.vacuum(keep_from_version=horizon, retain_ms=retain_ms)
    report["after"] = t.detail()
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--keep", type=int, default=10, help="versions to retain")
    ap.add_argument("--small-file-mb", type=float, default=32.0)
    ap.add_argument("--dv-ratio", type=float, default=0.1)
    ap.add_argument("--bloom", default="", help="comma-separated Bloom columns")
    ap.add_argument("--retain-hours", type=float, default=1.0)
    args = ap.parse_args()
    spark = get_session("novlake-maintenance")
    bloom = [c for c in args.bloom.split(",") if c]
    report = maintain(
        spark,
        args.path,
        keep_versions=args.keep,
        small_file_mb=args.small_file_mb,
        dv_ratio=args.dv_ratio,
        bloom_cols=bloom or None,
        retain_ms=int(args.retain_hours * 3_600_000),
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
