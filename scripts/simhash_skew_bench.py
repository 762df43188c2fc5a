"""Adversarial-skew scale measurement for the banded-SimHash pair feed
(VERDICT r8 task #3: the hamming-space analogue of the hot-shingle
case).

The disjoint-replica scale fixture keeps signatures decorrelated
across replicas, so SCALE.md's banded-simhash growth says nothing
about a boilerplate-heavy crawl: a block of near-identical documents
(hamming 0-3 of each other) collides in EVERY band, so the candidate
join materializes ~C(f, 2) rows on a handful of (band, bucket) shuffle
keys. This script makes that claim measurable: REPLACE 30% of
documents' text with one boilerplate sentence plus a per-doc marker
token (replacement, not append — the signature must be dominated by
the shared tokens for the block to be hamming-close), then time the
UNCAPPED banded feed against the (band, bucket)-capped feed and report
the spill.

Usage: python scripts/simhash_skew_bench.py
Prints one JSON line per (sf, mode) with wall seconds and pair counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BOILER = (
    "licensed under the apache license version two zero you may not use "
    "this file except in compliance with the license you may obtain a "
    "copy of the license at the usual location distributed on an as is "
    "basis without warranties or conditions of any kind either express "
    "or implied see the license for the specific language governing "
    "permissions and limitations"
)
RATE = 0.3  # fraction of docs replaced by the boilerplate block


def main() -> None:
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.operators.dedup import cap_hot_buckets, lsh_hot_buckets
    from crypto_etl_pipeline_spark.queries.text import (
        SIMHASH_BUCKET_CAP,
        _simhash_pairs_from_post,
        _simhash_post,
    )
    from crypto_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="simhash_skew_bench")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1.0", os.path.join(ROOT, ".scale", "sf1.0")),
    ]
    for label, path in dirs:
        docs = (
            spark.read.parquet(f"{path}/documents.parquet")
            .select("doc_id", "text")
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 < int(RATE * 10),
                    F.concat_ws(
                        " ", F.lit(BOILER), F.concat(F.lit("marker"), F.col("doc_id"))
                    ),
                ).otherwise(F.col("text")),
            )
            .localCheckpoint()  # eager: injection is fixture prep, not timed
        )
        n_docs = docs.count()
        for mode in ("capped", "uncapped"):
            t0 = time.perf_counter()
            post = _simhash_post(docs)
            if mode == "capped":
                spill = lsh_hot_buckets(post, SIMHASH_BUCKET_CAP).agg(
                    F.count(F.lit(1)).alias("hot"),
                    F.coalesce(F.sum("skipped_comparisons"), F.lit(0)).alias("sk"),
                ).collect()[0]
                pairs = _simhash_pairs_from_post(
                    cap_hot_buckets(post, SIMHASH_BUCKET_CAP)
                )
            else:
                spill = None
                pairs = _simhash_pairs_from_post(post)
            n_pairs = pairs.count()
            dt = round(time.perf_counter() - t0, 2)
            rec = {
                "sf": label,
                "mode": mode,
                "n_docs": n_docs,
                "wall_sec": dt,
                "n_pairs": n_pairs,
            }
            if spill is not None:
                rec["hot_buckets"] = int(spill["hot"])
                rec["skipped_comparisons"] = int(spill["sk"])
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
