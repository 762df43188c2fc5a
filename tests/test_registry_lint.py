"""Registry-wide hygiene lints: metadata completeness and a plan-level
scale guard over every registered query.

Each parametrized case builds its query's plan ONCE and runs all three
plan checks on it (cartesian, broadcast-hint boundedness, fingerprint
snapshot) — the fingerprint guard used to be a second full-registry
pass in test_scale_patterns.py, ~2 min of duplicated plan builds.
"""

from __future__ import annotations

import json
import os

import pytest

from crypto_etl_pipeline_spark.queries import REGISTRY

BATCH_QUERIES = sorted(
    n for n, s in REGISTRY.items()
    if not (n.startswith("stream_") or "streaming" in s.tags)
)

_SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_FINGERPRINTS.json")
with open(_SNAPSHOT) as _fh:
    FINGERPRINTS = json.load(_fh)


def test_registry_metadata_complete():
    """Every entry has a description, at least one tag, and an oracle
    that is either None (rows-only, deliberate) or a SELECT/WITH."""
    assert len(REGISTRY) == len({n.lower() for n in REGISTRY}), "case-colliding names"
    for n, s in REGISTRY.items():
        assert s.description, f"{n}: missing description"
        assert s.tags, f"{n}: missing tags"
        if s.oracle is not None:
            head = s.oracle.strip().split(None, 1)[0].upper()
            assert head in ("SELECT", "WITH"), f"{n}: oracle does not start with SELECT/WITH"


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_product_plans(name, spark, built_df):
    """Scale lints, one plan build per query.

    1. No CartesianProduct (both-sides-large cross join). Intentional
       scalar broadcasts plan as BroadcastNestedLoopJoin and are fine;
       a CartesianProduct means a join lost its keys or its broadcast
       and would be quadratic at 100 TB.
    2. No forced ``F.broadcast()`` hint on a frame whose lineage
       reaches an SF-scaled parquet scan (lineitem/orders/customer/
       supplier/part/events/documents/embeddings) without an
       intervening Aggregate/Limit (plans/lint.py). A forced hint
       overrides the 64 MB threshold with no AQE fallback — at 100x
       the side OOMs the driver (VERDICT r6 'What's wrong' #1).
       Bounded query/dim sides must make the bound structural
       (``.limit(n)`` or a groupBy on a bounded key).
    3. Plan-shape fingerprint matches PLAN_FINGERPRINTS.json
       (BHJ/SMJ/exchange/cartesian/pushed-filter counts): a new
       SortMergeJoin, a lost broadcast, an extra shuffle, or a lost
       pushed filter fails here, not in a per-round manual audit.
       Regenerate after a DELIBERATE plan change with
       `python scripts/plan_fingerprints.py --update`."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from plan_fingerprints import fingerprint

    from crypto_etl_pipeline_spark.plans.lint import unbounded_broadcast_hints

    df = built_df(name, "/root/testdata/sf0.001")
    hints = unbounded_broadcast_hints(df)
    assert not hints, (
        f"{name} force-broadcasts a frame derived from SF-scaled "
        f"table(s) {[t for t, _ in hints]} with no Aggregate/Limit bound"
    )
    got = fingerprint(df)
    assert got["cartesian"] == 0, f"{name} plans a CartesianProduct"
    assert got == FINGERPRINTS.get(name), (
        f"{name} plan-shape drift (run scripts/plan_fingerprints.py "
        f"--update if deliberate): {FINGERPRINTS.get(name)} -> {got}"
    )
