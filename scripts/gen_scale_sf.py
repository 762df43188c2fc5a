"""Deterministic scale-up of the driver testdata for scale-curve
measurement (VERDICT_r5 task #2).

/root/testdata is read-only and tops out at sf0.1; measuring whether
the heavy dedup/ANN/streaming plans grow LINEARLY needs at least one
larger point. This script builds sf0.1×R (default R=3 ≈ "sf0.3") under
.scale/ by unioning R disjoint key-space replicas of sf0.1:

- region/nation stay fixed (TPC-H semantics: they never scale).
- Fact/dim keys shift by replica × stride (stride = 10^ceil(log10(max
  key+1)) per key domain), applied consistently across FK edges, so
  each replica is a self-contained sub-database: per-key join
  selectivity, group sizes per key, and date/price distributions are
  EXACTLY those of sf0.1 — growth in query time then measures the
  ENGINE's scaling, not a changed data distribution.
- documents: replica r>0 suffixes every whitespace token with "_r{r}"
  — shingle/token sets are disjoint across replicas, so near-dup and
  containment structure replicates (pair count grows linearly, the
  "corpus grows, dup rate constant" model) instead of every replica
  pairing with its source (which would grow pairs quadratically for
  data reasons and mask plan behavior). n_chars is recomputed.
- embeddings: replica r>0 rotates the 64-dim vector by 7r positions —
  rotation preserves norms and all WITHIN-replica cosines (semantic
  dup structure replicates); cross-replica cosines decorrelate.

The output is a measurement fixture, NOT driver testdata: nothing
here is oracle-compared (correctness is pinned at sf0.01); only
wall-clock growth factors are read from it.

Usage: python scripts/gen_scale_sf.py [R] [out_dir]
  defaults: R=3, out_dir=.scale/sf0.3
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def _stride(con, table: str, col: str) -> int:
    m = con.sql(f"SELECT max({col}) FROM read_parquet('{SRC}/{table}.parquet')").fetchone()[0]
    s = 1
    while s <= m:
        s *= 10
    return s


def main() -> None:
    r_total = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf0.3"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    cust = _stride(con, "customer", "c_custkey")
    supp = _stride(con, "supplier", "s_suppkey")
    part = _stride(con, "part", "p_partkey")
    okey = _stride(con, "orders", "o_orderkey")
    evid = _stride(con, "events", "event_id")
    uid = _stride(con, "events", "user_id")
    doc = _stride(con, "documents", "doc_id")
    vec = _stride(con, "embeddings", "vec_id")

    def copy(table: str, select_tpl: str) -> None:
        parts = [
            select_tpl.format(r=r)
            for r in range(r_total)
        ]
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dims
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    copy(
        "customer",
        f"SELECT c_custkey + {{r}}*{cust} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM read_parquet('{SRC}/customer.parquet')",
    )
    copy(
        "supplier",
        f"SELECT s_suppkey + {{r}}*{supp} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM read_parquet('{SRC}/supplier.parquet')",
    )
    copy(
        "part",
        f"SELECT p_partkey + {{r}}*{part} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM read_parquet('{SRC}/part.parquet')",
    )
    copy(
        "orders",
        f"SELECT o_orderkey + {{r}}*{okey} AS o_orderkey, "
        f"o_custkey + {{r}}*{cust} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM read_parquet('{SRC}/orders.parquet')",
    )
    copy(
        "lineitem",
        f"SELECT l_orderkey + {{r}}*{okey} AS l_orderkey, "
        f"l_partkey + {{r}}*{part} AS l_partkey, "
        f"l_suppkey + {{r}}*{supp} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM read_parquet('{SRC}/lineitem.parquet')",
    )
    copy(
        "events",
        f"SELECT event_id + {{r}}*{evid} AS event_id, ts, "
        f"user_id + {{r}}*{uid} AS user_id, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')",
    )
    copy(
        "documents",
        f"SELECT doc_id + {{r}}*{doc} AS doc_id, "
        "CASE WHEN {r} = 0 THEN text "
        "ELSE regexp_replace(text, '(\\S+)', '\\1_r{r}', 'g') END AS text, "
        f"lang, source, "
        "length(CASE WHEN {r} = 0 THEN text "
        "ELSE regexp_replace(text, '(\\S+)', '\\1_r{r}', 'g') END)::BIGINT AS n_chars "
        f"FROM read_parquet('{SRC}/documents.parquet')",
    )
    rot = 7
    copy(
        "embeddings",
        f"SELECT vec_id + {{r}}*{vec} AS vec_id, "
        "CASE WHEN {r} = 0 THEN embedding ELSE "
        f"(embedding[1 + (({{r}}*{rot}) % 64):] || embedding[:(({{r}}*{rot}) % 64)])::FLOAT[] "
        "END AS embedding, label "
        f"FROM read_parquet('{SRC}/embeddings.parquet')",
    )
    print(f"wrote {out} (R={r_total})")


if __name__ == "__main__":
    main()
