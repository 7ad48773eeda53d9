"""Plan-shape snapshot: a diffable record of each headline query's
physical plan so perf regressions show up as PLAN changes (lost
broadcast, extra Exchange, a Python UDF sneaking into a hot path), not
just wall-time drift.

For every bench.HEADLINE key the tool extracts scale-relevant features
from the executed plan and an id-normalized fingerprint hash, then
writes PLANS.json at the repo root. Diff it across rounds:

- ``exchanges`` up       → a new shuffle appeared
- ``broadcast_joins`` down / ``sort_merge_joins`` up → a broadcast was
  lost (size estimate drift, missing hint)
- ``python_evals`` up    → row-at-a-time Python entered the plan
- ``wscg_spans`` down    → whole-stage codegen got fragmented
- ``hash`` changed with all counters equal → same cost shape, benign

Usage: python tools/plan_audit.py            (sf0.1, all HEADLINE keys)
       SF_DIR=... python tools/plan_audit.py q_join_star ...
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from novlake_spark.registry import queries  # noqa: E402
from novlake_spark.session import get_session  # noqa: E402

#: node-name → feature counter. Substring matches on plan lines.
FEATURES = {
    "exchanges": re.compile(r"\bExchange\b(?! SinglePartition)"),
    "single_part_exchanges": re.compile(r"Exchange SinglePartition"),
    "broadcast_joins": re.compile(r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    "sort_merge_joins": re.compile(r"SortMergeJoin"),
    "shuffled_hash_joins": re.compile(r"ShuffledHashJoin"),
    "python_evals": re.compile(r"BatchEvalPython"),  # row-at-a-time UDF: should stay 0
    "arrow_evals": re.compile(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas"),
    "sorts": re.compile(r"\bSort\b"),
    "scans": re.compile(r"FileScan|Scan parquet"),
    # reads of a persisted intermediate (once per REFERENCE; the cached
    # plan itself is counted once — see _collapse_cached)
    "cached_scans": re.compile(r"InMemoryTableScan"),
}

#: codegen membership renders as a "*(n)" node prefix in plan toString;
#: the number of DISTINCT ids = whole-stage-codegen span count.
WSCG = re.compile(r"\*\((\d+)\)")


def normalize(plan: str) -> str:
    """Strip run-variant ids so the fingerprint is stable across
    sessions: expression ids (#123), codegen ids, plan ids, paths."""
    plan = re.sub(r"#\d+[A-Z]*", "#", plan)
    plan = re.sub(r"\[id=#?\d*\]", "", plan)
    # Spark 4 prints exchange/subquery references as [plan_id=N], a
    # SESSION-MONOTONE counter: unstripped, a key's hash depended on
    # which keys ran before it in the same session (round 9 find — the
    # "hash changed, counters equal" class was partly this noise)
    plan = re.sub(r"\[plan_id=\d+\]", "", plan)
    plan = re.sub(r"WholeStageCodegen \(\d+\)", "WholeStageCodegen", plan)
    plan = re.sub(r"(file:)?/[^,\s\]]+", "<path>", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "", plan)
    return plan


def _marker_pos(line: str) -> int:
    best = -1
    for pat in ("+- ", ":- "):
        p = line.find(pat)
        if p >= 0 and (best < 0 or p < best):
            best = p
    return best


def _collapse_cached(plan: str) -> str:
    """Collapse repeated InMemoryRelation subtrees to one occurrence.

    ``toString`` prints a persisted intermediate's FULL cached plan at
    every reference point, so a DF persisted for reuse (graph keys:
    the edge list feeds degree + orientation + each PageRank iteration)
    would inflate every counter by the reference count — the opposite
    of what executes (the cache materializes once; later references
    read columnar batches). Each distinct cache — identified by its
    normalized HEADER (schema + storage level) — is kept the first
    time and replaced by a one-line ref afterwards, which is exactly
    the executed cost shape.

    Known string-level caveat (round 10): once a cache is MATERIALIZED
    before the audit (an operator-internal bounded collect, or an
    iterative operator's actions), its references print as
    ``AdaptiveSparkPlan isFinalPlan=true`` whose Final-Plan section may
    ELIDE reused query stages' children — so counters inside that
    cache's build pipeline can undercount (e.g. a parquet scan hidden
    behind a reused ShuffleQueryStage). The main query body — where
    python_evals / single-partition exchanges / unbounded broadcasts
    would appear — is unaffected; treat build-pipeline counter DIFFS on
    cache-materializing keys with that grain of salt."""
    def _depth(line: str) -> int:
        # Tree depth of a plan line. Materialized caches print an
        # `AdaptiveSparkPlan isFinalPlan=true` body whose section lines
        # (`ResultQueryStage 1`, the first node under `== Initial Plan
        # ==`) carry NO `+-`/`:-` marker — the round-10 triangles bounds
        # collect() materialized the edge cache during plan build and
        # those marker-less lines made the old marker-only walk stop
        # mid-block, so the cached subtree escaped the collapse and was
        # re-counted at all ~38 reference points (scans 2→72 noise in
        # PLANS.json, found by the round-10 self-review). Fall back to
        # leading-scaffolding width when no marker exists.
        p = _marker_pos(line)
        if p >= 0:
            return p
        return len(line) - len(line.lstrip(" :"))

    lines = plan.splitlines()
    # Drop `== Initial Plan ==` sections outright: they are the
    # pre-AQE plan of a materialized cache — never executed — and
    # would double-count every node of the kept cached copy.
    pruned, i = [], 0
    while i < len(lines):
        if "== Initial Plan ==" in lines[i]:
            pos = _depth(lines[i])
            i += 1
            while i < len(lines) and _depth(lines[i]) > pos:
                i += 1
            continue
        pruned.append(lines[i])
        i += 1
    lines = pruned

    _SECTION = re.compile(r"^\s*\+?-?\s*== (Final|Initial) Plan ==")

    def _block_end(start: int, pos: int) -> int:
        # Walk a cached block. A MATERIALIZED cache's AdaptiveSparkPlan
        # body prints its `== Final/Initial Plan ==` sections with the
        # AQE printer's OWN indentation — for deeply-nested caches that
        # is SHALLOWER than the parent tree's scaffolding, so a pure
        # depth walk exits mid-block and the section body escapes the
        # collapse (the second failure shape the round-10 self-review's
        # find exposed once the first was fixed). The only shallow-reset
        # shape is those section headers, so consume a section (header +
        # its deeper body) whenever one appears where depth says the
        # block ended.
        j = start
        while j < len(lines):
            if _depth(lines[j]) > pos:
                j += 1
                continue
            if _SECTION.match(lines[j]):
                spos = _depth(lines[j])
                j += 1
                while j < len(lines) and _depth(lines[j]) > spos:
                    j += 1
                continue
            break
        return j

    def _scan_fp(start: int, end: int) -> frozenset:
        # Weak body fingerprint: the normalized leaf-scan lines inside
        # the block. Same-cache reprints agree on these UP TO ELISION
        # (an AQE-materialized reference may hide scans behind reused
        # query stages — only ever DROPPING lines), so two prints of
        # one cache are always subset-related; two DISTINCT caches that
        # merely share a column list + storage level read different
        # relations and cross.
        return frozenset(
            normalize(lines[j])
            for j in range(start, end)
            if "FileScan" in lines[j] or "Scan parquet" in lines[j]
        )

    out, seen, i = [], {}, 0
    while i < len(lines):
        line = lines[i]
        if "InMemoryRelation" in line:
            pos = _marker_pos(line)
            j = _block_end(i + 1, pos)
            # dedup key = the normalized HEADER line (schema + storage
            # level), not the body: one logical cache prints its child
            # as `AdaptiveSparkPlan isFinalPlan=true` + QueryStage-
            # wrapped Final Plan at references printed AFTER an action
            # materialized it, and as the static `isFinalPlan=false`
            # tree elsewhere in the SAME plan string — body hashes
            # differ, the cache is one, and keeping both double-counted
            # every node of its build pipeline (round-10 self-review
            # follow-up). The invariant "distinct caches never share a
            # normalized column list" is now CHECKED, not assumed
            # (ADVICE r10): a header-key collision whose scan sets
            # cross (neither subset — elision only drops lines, so
            # same-cache reprints are always subset-related) is two
            # different persisted plans being collapsed; warn loudly so
            # the undercount is visible in the audit run.
            key = normalize(re.sub(r"^[\s:]*(\+-|:-)?\s*", "", line))
            if key in seen:
                fp = _scan_fp(i + 1, j)
                old = seen[key]
                if not (fp <= old or old <= fp):
                    print(
                        f"plan_audit: WARNING cache-collapse collision — two "
                        f"distinct persisted plans share header {key[:120]!r}; "
                        f"scans/exchanges undercounted",
                        file=sys.stderr,
                    )
                out.append(line[: max(pos, 0)] + "+- InMemoryRelation <cached-plan-ref>")
                i = j
                continue
            seen[key] = _scan_fp(i + 1, j)
            # keep the header line only and keep scanning INSIDE the
            # block so nested cached relations register individually
        out.append(line)
        i += 1
    return "\n".join(out)


def audit(df) -> dict:
    # Physical planning is lazy; flipping AQE off just before inspection
    # yields the fully-annotated STATIC plan (codegen stars, final join
    # strategies) instead of an unexecuted AdaptiveSparkPlan wrapper.
    # The snapshot is therefore the compile-time plan — AQE's runtime
    # re-planning is an improvement on top, not part of the fingerprint.
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    norm = normalize(_collapse_cached(plan))
    out = {k: len(rx.findall(norm)) for k, rx in FEATURES.items()}
    out["wscg_spans"] = len(set(WSCG.findall(plan)))
    out["hash"] = hashlib.md5(norm.encode()).hexdigest()[:12]
    return out


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    keys = sys.argv[1:] or HEADLINE
    spark = get_session("novlake-plan-audit", shuffle_partitions=8)
    qs = queries()
    from novlake_spark.cache import release_tracked

    report = {}
    for key in keys:
        report[key] = audit(qs[key](spark, sf_dir))
        # plan-building a persisting operator registers tracked caches
        # (graph/LM keys); hand them back per key like bench/verify do
        release_tracked()
        flags = []
        if report[key]["python_evals"]:
            flags.append("PYTHON-UDF-IN-PLAN")
        print(f"{key}: {json.dumps(report[key])} {' '.join(flags)}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.json")
    if sys.argv[1:] and os.path.exists(out):
        # subset run: merge into the existing snapshot, don't clobber it
        with open(out) as f:
            merged = json.load(f)
        merged.update(report)
        report = merged
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
