"""Plan-level broadcast-hint lint (shared by tests/test_registry_lint.py).

Walks the ANALYZED logical plan of a DataFrame looking for broadcast
``ResolvedHint`` nodes whose subtree reaches an SF-scaled parquet scan
(lineitem/orders/customer/supplier/part/events/documents/embeddings)
without an intervening row-bounding node (Aggregate / GlobalLimit /
LocalLimit). Such a hint forces Spark to materialize a fact-sized side
on the driver at scale — the 100 TB anti-pattern (VERDICT r6 #1).

Hints that survive an Aggregate are fine: the hinted frame is a
(grouped) aggregate whose cardinality is set by its keys, not by the
corpus — the per-query registry review is responsible for key
boundedness (the lint is the backstop for raw/projected fact sides).
"""

from __future__ import annotations

# Tables whose row count scales with SF (everything except nation/region).
SF_SCALED_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)

# Nodes below which row count no longer tracks the scanned table.
_BOUNDING_NODES = {"Aggregate", "GlobalLimit", "LocalLimit"}


def _children(node):
    cs = node.children()
    for i in range(cs.size()):
        yield cs.apply(i)


def _fact_scan_below(node):
    """First SF-scaled table reachable from ``node`` without passing
    through a row-bounding operator, else None."""
    name = node.getClass().getSimpleName()
    if name in _BOUNDING_NODES:
        return None
    if name == "LogicalRelation":
        # HadoopFsRelation: path lives on the file index, not toString()
        try:
            paths = node.relation().location().rootPaths()
            s = " ".join(paths.apply(i).toString() for i in range(paths.size()))
        except Exception:
            s = node.toString()
        for t in SF_SCALED_TABLES:
            if f"/{t}.parquet" in s or f"/{t}/" in s:
                return t
    for c in _children(node):
        hit = _fact_scan_below(c)
        if hit is not None:
            return hit
    return None


def unbounded_broadcast_hints(df):
    """Return [(table, hint_node_string_head)] for every broadcast hint
    in ``df``'s analyzed plan whose subtree reaches an SF-scaled scan
    with no Aggregate/Limit in between."""
    out = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "ResolvedHint" and "broadcast" in node.hints().toString().lower():
            hit = _fact_scan_below(node)
            if hit is not None:
                head = node.toString().split("\n", 1)[0]
                out.append((hit, head))
        stack.extend(_children(node))
    return out
