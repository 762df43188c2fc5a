"""Snapshot plan-shape fingerprints for every registry query.

Writes PLAN_FINGERPRINTS.json at the repo root: for each query, the
physical-plan metrics the 100 TB posture claims rest on —
BroadcastHashJoin / SortMergeJoin / shuffle-exchange counts, cartesian
products, and pushed-filter scans — measured at sf0.001 (plan SHAPE is
scale-invariant for these queries; AQE's initial plan is
deterministic). tests/test_scale_patterns.py compares the live plans
against this snapshot and fails on any regression (a new SortMergeJoin,
a new exchange, a lost pushed filter), so "zero SMJ across the
registry" is a mechanically enforced invariant rather than a per-round
audit.

Queries that EXECUTE inside their builder (streaming drains, contract
queries that collect, iterative ops returning checkpointed results)
return a post-hoc plan (memory sink / LocalTableScan / ExistingRDD)
with no scan-to-sink lineage; their fingerprint records that terminal
shape, which is still a regression guard (e.g. a streaming query
silently becoming a batch LocalTableScan would show).

Usage: python scripts/plan_fingerprints.py [--update]
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SNAPSHOT = os.path.join(ROOT, "PLAN_FINGERPRINTS.json")
SF = "/root/testdata/sf0.001"


def fingerprint(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": len(re.findall(r"BroadcastHashJoin", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "exchanges": len(re.findall(r"Exchange (hash|range|single)", p)),
        "cartesian": len(re.findall(r"CartesianProduct", p)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", p)),
        "pushed_filter_scans": len(re.findall(r"PushedFilters: \[[^\]]", p)),
    }


def collect(only: set[str] | None = None) -> dict:
    from crypto_etl_pipeline_spark.queries import REGISTRY
    from crypto_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan_fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in sorted(REGISTRY):
        if only is not None and name not in only:
            continue
        try:
            out[name] = fingerprint(REGISTRY[name].fn(spark, SF))
        except Exception as ex:  # pragma: no cover - registry breakage
            out[name] = {"error": str(ex)[:200]}
    return out


def main() -> None:
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    got = collect(only)
    if only:
        # merge the named queries into the existing snapshot (the
        # incremental path for newly registered queries — a full sweep
        # re-validates everything and is the pre-commit check).
        want = json.load(open(SNAPSHOT)) if os.path.exists(SNAPSHOT) else {}
        want.update(got)
        with open(SNAPSHOT, "w") as f:
            json.dump(want, f, indent=1, sort_keys=True)
        print(f"merged {sorted(got)} into {SNAPSHOT} ({len(want)} queries)")
        return
    if "--update" in sys.argv or not os.path.exists(SNAPSHOT):
        with open(SNAPSHOT, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"wrote {SNAPSHOT} ({len(got)} queries)")
        return
    want = json.load(open(SNAPSHOT))
    bad = []
    for name, fp in got.items():
        w = want.get(name)
        if w is None:
            bad.append(f"{name}: NEW (run --update)")
        elif fp != w:
            bad.append(f"{name}: {w} -> {fp}")
    for b in bad:
        print("DRIFT", b)
    print(f"DONE drift={len(bad)} total={len(got)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
