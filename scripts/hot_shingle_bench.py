"""Adversarial-skew scale measurement for the exact posting pair feed.

The disjoint-replica scale fixture (scripts/gen_scale_sf.py) keeps
per-shingle document frequency CONSTANT as the corpus grows, so the
sub-linear pair-feed growth SCALE.md records is real on that fixture
but says nothing about a boilerplate-heavy crawl — the adversarial
case VERDICT r7 flagged (one shingle in f docs = C(f, 2) join rows on
ONE shuffle key). This script makes the claim the replica fixture
cannot: inject one boilerplate sentence into 30% of documents at
sf0.1 and sf1.0, then time the UNCAPPED feed (quadratic in the
boilerplate block) against the DF-CAPPED feed (flat by construction)
and report the spill metric.

Usage: python scripts/hot_shingle_bench.py
Prints one JSON line per (sf, mode) with wall seconds and pair counts.
sf1.0 uncapped materializes ~3 x C(15000, 2) = 337M posting-join rows
— that row is the point.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

#: 5 tokens -> 3 interior pure-boilerplate shingles per injected doc
BOILER = "licensed under the apache license"
RATE = 0.3  # fraction of docs carrying the boilerplate (hash-gated)
CAP = 64  # df cap: natural sf1.0 shingle DF tops out ~5, hot ones hit 15k


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.operators.dedup import (
        hot_shingle_spill,
        shingle_posting_pairs,
    )
    from crypto_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="hot_shingle_bench")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1.0", os.path.join(ROOT, ".scale", "sf1.0")),
    ]
    for label, path in dirs:
        docs = (
            spark.read.parquet(f"{path}/documents.parquet")
            .select("doc_id", "lang", "text")
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 < int(RATE * 10),
                    F.concat_ws(" ", F.col("text"), F.lit(BOILER)),
                ).otherwise(F.col("text")),
            )
            .localCheckpoint()  # eager: injection is fixture prep, not timed
        )
        n_docs = docs.count()
        spill = hot_shingle_spill(docs, shingle_df_cap=CAP).agg(
            F.count(F.lit(1)).alias("hot"),
            F.sum("skipped_comparisons").alias("skipped"),
        ).collect()[0]
        for mode, cap in (("capped", CAP), ("uncapped", None)):
            t0 = time.perf_counter()
            n_pairs = shingle_posting_pairs(docs, shingle_df_cap=cap).count()
            dt = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {
                        "sf": label,
                        "mode": mode,
                        "n_docs": n_docs,
                        "wall_sec": dt,
                        "n_pairs": n_pairs,
                        "hot_shingles": int(spill["hot"]),
                        "skipped_comparisons": int(spill["skipped"]),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
