"""Incremental MinHash-LSH dedup against a persisted fingerprint store.

The trust property of incremental dedup is EXACT equivalence with the
batch path: fingerprinting only the new documents and joining against
the store must find precisely the pairs the full-corpus batch run would
find among pairs touching a new doc. These tests prove that on the real
documents table, plus the persistence round-trip and the no-recompute
plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.dedup import (
    MinhashStore,
    build_minhash_store,
    incremental_near_dups,
    near_dup_pairs_minhash,
)
from crypto_etl_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

THRESHOLD = 0.05


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return docs, docs.where(F.col("doc_id") % 2 == 0), docs.where(F.col("doc_id") % 2 == 1)


@pytest.fixture(scope="module")
def store_old(corpus):
    """ONE default-batch store build shared by the equivalence,
    round-trip, and no-recompute tests — the build (tokenize + 32-hash
    signatures + banding, eagerly materialized) was the dominant cost
    of this module when each test rebuilt it."""
    _, old, _ = corpus
    return build_minhash_store(old)


def test_incremental_equals_batch_restricted_to_new(corpus, store_old):
    """batch(old ∪ new) == batch(old) ∪ incremental(new, store(old)) —
    the doubled-corpus equivalence, on the real documents table."""
    docs, old, new = corpus

    batch_full = _pairs_set(near_dup_pairs_minhash(docs, threshold=THRESHOLD))
    batch_old = _pairs_set(near_dup_pairs_minhash(old, threshold=THRESHOLD))
    inc, _ = incremental_near_dups(new, store_old, threshold=THRESHOLD)
    inc_pairs = _pairs_set(inc)

    assert batch_old | inc_pairs == batch_full
    assert batch_old & inc_pairs == set()  # incremental never re-reports old-only pairs
    assert inc_pairs, "fixture must exercise at least one new-doc pair"
    # pairs touching at least one new (odd) doc — exactly the oracle's filter
    assert all(a % 2 == 1 or b % 2 == 1 for a, b, _ in inc_pairs)


def test_updated_store_matches_batch_rebuild(spark, tmp_path, corpus, store_old):
    """The updated store returned by incremental_near_dups must equal a
    from-scratch store over the full corpus (so the NEXT incremental run
    starts from exactly batch state), and survive a parquet round-trip."""
    docs, _old, new = corpus

    _, updated = incremental_near_dups(new, store_old, threshold=THRESHOLD)
    updated.save(str(tmp_path / "store"))
    loaded = MinhashStore.load(spark, str(tmp_path / "store"))

    # fingerprint CONTENT must equal a from-scratch rebuild; the
    # ingest_batch provenance tag legitimately differs (base+delta vs
    # all-base), so it is excluded from the comparison.
    rebuilt = build_minhash_store(docs)
    assert {tuple(r) for r in loaded.sigs.drop("ingest_batch").collect()} == {
        tuple(r) for r in rebuilt.sigs.drop("ingest_batch").collect()
    }
    assert {tuple(r) for r in loaded.bands.drop("ingest_batch").collect()} == {
        tuple(r) for r in rebuilt.bands.drop("ingest_batch").collect()
    }
    assert loaded.shingles.count() == rebuilt.shingles.count()


def _partition_files(root):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_append_batch_leaves_old_partitions_untouched(spark, tmp_path):
    """The whole point of the incremental path is that corpus-side work
    does not scale with corpus size — including PERSISTENCE. Appending
    a new ingest batch must write only that batch's partition
    directories; every pre-existing file stays byte-identical in place
    (path + size + mtime), and the reloaded store equals a full
    rebuild."""
    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "store")

    build_minhash_store(old, batch_id="b_old").save(path)
    before = {
        t: _partition_files(f"{path}/{t}/ingest_batch=b_old")
        for t in ("sigs", "bands", "shingles")
    }
    assert all(before[t] for t in before), "bootstrap must have written files"

    store = MinhashStore.load(spark, path)
    pairs, updated = incremental_near_dups(
        new, store, threshold=THRESHOLD, batch_id="b_new"
    )
    pairs.count()
    updated.append_batch(path, "b_new")

    after = {
        t: _partition_files(f"{path}/{t}/ingest_batch=b_old")
        for t in ("sigs", "bands", "shingles")
    }
    assert after == before, "old batch partition files must be untouched"
    for t in ("sigs", "bands", "shingles"):
        assert _partition_files(f"{path}/{t}/ingest_batch=b_new"), t

    # append_batch is idempotent: re-running the same batch replaces its
    # partition rather than doubling it
    updated.append_batch(path, "b_new")
    reloaded = MinhashStore.load(spark, path)
    rebuilt = build_minhash_store(docs)
    assert {tuple(r) for r in reloaded.sigs.drop("ingest_batch").collect()} == {
        tuple(r) for r in rebuilt.sigs.drop("ingest_batch").collect()
    }
    assert {tuple(r) for r in reloaded.bands.drop("ingest_batch").collect()} == {
        tuple(r) for r in rebuilt.bands.drop("ingest_batch").collect()
    }
    assert reloaded.shingles.count() == rebuilt.shingles.count()
    assert set(
        r["ingest_batch"]
        for r in reloaded.sigs.select("ingest_batch").distinct().collect()
    ) == {"b_old", "b_new"}


def test_incremental_store_side_is_lookup_not_recompute(spark, tmp_path, corpus, store_old):
    """With the store loaded from parquet, the incremental plan's corpus
    side must be a FileScan of the store tables — the old documents'
    text is not an input, so re-tokenizing the corpus is structurally
    impossible; assert the plan reads the store parquet directly."""
    docs, _old, new = corpus

    store_old.save(str(tmp_path / "store"))
    store = MinhashStore.load(spark, str(tmp_path / "store"))
    pairs, _ = incremental_near_dups(new, store, threshold=THRESHOLD)

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # The corpus side must be parquet scans of the store (band lookup +
    # two shingle-rehydration branches), and the old documents' text
    # must appear NOWHERE in the pair plan — no recompute. (Store paths
    # can be truncated out of FileScan Location strings, so count scan
    # nodes rather than matching the tmp path.)
    assert plan.count("FileScan parquet") >= 3, plan
    assert "documents" not in plan, "corpus text must not be rescanned"
    # equivalence still holds when the store comes off disk
    batch_full = _pairs_set(near_dup_pairs_minhash(docs, threshold=THRESHOLD))
    inc_pairs = _pairs_set(pairs)
    assert inc_pairs == {p for p in batch_full if p[0] % 2 == 1 or p[1] % 2 == 1}
