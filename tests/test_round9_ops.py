"""Round 9: regression tests for the four ADVICE r8 findings.

1. hot_shingle_spill's skipped_comparisons must be exact INTEGER
   arithmetic (`div`), not double-promoting `/` — past 2^53
   (df >~ 9.5e7, plausible for the boilerplate-skew corpora the audit
   targets) the double form drifts from the oracle's integer `//`.
2. dedup_semantic_threshold_sweep's cap_hot_cells must be a NO-OP at
   parity SFs (the xxhash64 sub-cell split is not SQL-replayable, so
   the DuckDB oracle pairs within RAW cells) — assert max raw cell
   size <= SEM_CELL_CAP at the driver's gate SF so the documented
   caveat is a checked invariant, not a comment.
3. bench.py only attests bench_full_sha256 when the BENCH_FULL.json
   write landed (wrote_ok flag) — covered by code read; the testable
   half is that the summary schema carries either the sha or the
   explicit write_failed marker (checked in test_gate_budget.py's
   bench-artifact schema check).
4. dedup_simhash_hamming_calibration must not emit NULL jaccard for a
   banded pair of sub-3-token docs (0/0 under `/`): textops.jaccard's
   union==0 guard on the Spark side, CASE on the oracle side — parity
   checked on a crafted fixture where the edge actually fires.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.dedup import hot_shingle_spill
from crypto_etl_pipeline_spark.queries import REGISTRY

SF_GATE = "/root/testdata/sf0.01"


@pytest.mark.quick
def test_hot_shingle_spill_integer_div(spark):
    """skipped_comparisons == C(df,2) exactly and stays BIGINT
    end-to-end. The bigint dtype IS the integral-division guarantee:
    `(df*(df-1))/2` with true division would analyze to DOUBLE, so the
    dtype assert fails if anyone swaps `div` for `/` — no need to grep
    the (version-unstable) plan string for ' div ' (r9 ADVICE #3)."""
    docs = spark.createDataFrame(
        [(i, "licensed under the apache license") for i in range(7)],
        "doc_id long, text string",
    )
    out = hot_shingle_spill(docs, shingle_df_cap=2)
    rows = {r["shingle"]: r for r in out.collect()}
    # 5 tokens -> 3 shingles, each in all 7 docs -> C(7,2) = 21
    assert len(rows) == 3
    for r in rows.values():
        assert r["df"] == 7
        assert r["skipped_comparisons"] == 21
    assert dict(out.dtypes)["skipped_comparisons"] == "bigint"


@pytest.mark.quick
def test_semantic_sweep_cap_noop_at_gate_sf(spark):
    """The parity caveat as an invariant: at the driver's gate SF the
    raw IVF cells must all be <= SEM_CELL_CAP, so cap_hot_cells is a
    no-op and the raw-cell DuckDB oracle replays the Spark plan."""
    from crypto_etl_pipeline_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_build_centroids,
    )
    from crypto_etl_pipeline_spark.queries.vector import SEM_CELL_CAP, sem_k
    from crypto_etl_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, SF_GATE, "embeddings")
    cents = ivf_build_centroids(emb, k=sem_k(emb.count()), iters=0)
    max_cell = (
        ivf_assign_cells(emb, cents)
        .groupBy("_cell")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert max_cell <= SEM_CELL_CAP, (
        f"raw IVF cell of {max_cell} members exceeds SEM_CELL_CAP="
        f"{SEM_CELL_CAP}: cap_hot_cells engages at the parity SF and the "
        f"dedup_semantic_threshold_sweep oracle (raw cells) diverges"
    )


@pytest.mark.quick
def test_simhash_calibration_union_zero_guard(spark, tmp_path):
    """Two identical 2-token docs band together (hamming 0) but have
    EMPTY 3-shingle sets: jaccard must be 0.0 (guarded), not NULL, and
    Spark must agree with the CASE-guarded oracle on this fixture."""
    docs = spark.createDataFrame(
        [
            (1, "hello world", "en", "src0", 11),
            (2, "hello world", "en", "src0", 11),
            # a normal near-dup pair so the output has a non-degenerate row
            (3, "quick brown foxes jump over lazy dogs near river banks", "en", "src1", 54),
            (4, "quick brown foxes jump over lazy dogs near river docks", "en", "src1", 54),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))

    spec = REGISTRY["dedup_simhash_hamming_calibration"]
    out = spec.fn(spark, sf_dir).collect()
    by_h = {r["hamming"]: r for r in out}
    assert 0 in by_h, f"hamming-0 row missing: {out}"
    h0 = by_h[0]
    # the short-doc pair is hamming 0 with union==0 -> guarded 0.0;
    # min over the hamming-0 group is therefore exactly 0.0, never NULL
    assert h0["min_jaccard"] == 0.0
    assert all(r["mean_jaccard"] is not None for r in out)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = {r[dcols.index("hamming")]: r for r in res.fetchall()}
    assert set(drows) == set(by_h)
    for h, r in by_h.items():
        d = drows[h]
        assert r["n_pairs"] == d[dcols.index("n_pairs")]
        assert float(r["min_jaccard"]) == pytest.approx(
            float(d[dcols.index("min_jaccard")]), abs=1e-9
        )


# -- cascade v2: engaged-cap parity + paragraph stage (VERDICT r8 #6/#8) ----

#: 20+ near-identical (NOT identical — exact dedup must keep them) docs
#: that flood every LSH band bucket past CASCADE_BUCKET_CAP=16
_BOILER_N = 24
_BOILER = (
    "licensed under the apache license version two zero you may not use "
    "this file except in compliance with the license obtain a copy at "
    "the usual location unto distribution is on an as is basis without "
    "warranties or conditions of any kind either express or implied"
)


def _cascade_fixture(spark, tmp_path):
    rows = [
        (i, f"{_BOILER} marker{i}", "en", "boiler", len(_BOILER) + 8)
        for i in range(_BOILER_N)
    ]
    # a verbatim duplicate pair (exact stage) and a fully-boilerplate
    # paragraph doc are NOT included: keep the fixture focused on the
    # engaged cap; stages 1/3 are exercised at the gate SF
    rows += [
        (100, "completely different text about rivers and mountain paths winding north", "en", "src1", 70),
        (101, "completely different text about rivers and mountain paths winding south", "en", "src1", 70),
        # two docs with NO shared 5-grams anywhere: the only survivors
        # of the boilerplate prune (the near-dup pair above shares all
        # its 5-grams with itself, so df>=2 marks it boilerplate too)
        (200, "solitary glacier retreat metrics compiled for annual hydrology review boards", "en", "src2", 75),
        (201, "quantum dot emitter calibration notes archived beneath basalt vault nine", "en", "src3", 72),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


def test_cascade_engaged_cap_parity(spark, tmp_path):
    """On a boilerplate-flooded corpus the bucket cap ENGAGES (spill >
    0, capped != uncapped) and the SQL-replayed cap keeps both engines
    in exact agreement — the non-vacuous parity check for the capped
    cascade (the gate-SF data leaves the cap a no-op)."""
    from crypto_etl_pipeline_spark.queries.text import CASCADE_BUCKET_CAP

    assert _BOILER_N > CASCADE_BUCKET_CAP
    sf_dir = _cascade_fixture(spark, tmp_path)
    spec = REGISTRY["dedup_cascade_report"]
    rows = {r["stage"]: r for r in spec.fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # every band bucket holding the 24 boilerplate docs is capped:
    # spill > 0 and visible IN the funnel row
    assert rows[2]["spilled_comparisons"] > 0
    # the boilerplate docs are near-identical but every band is capped,
    # so they survive the (capped) near-dup stage — the documented
    # recall trade the cap makes; the spill column is what tells the
    # corpus owner to handle them upstream
    assert rows[2]["docs_out"] >= _BOILER_N

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    for drow in res.fetchall():
        srow = rows[drow[dcols.index("stage")]]
        for c in ("stage_name", "docs_in", "docs_removed", "docs_out", "spilled_comparisons"):
            assert srow[c] == drow[dcols.index(c)], (
                f"stage {srow['stage']} col {c}: spark={srow[c]} duck={drow[dcols.index(c)]}"
            )


def test_cascade_paragraph_stage_removes_fully_redundant_doc(spark, tmp_path):
    """A doc whose every PARA_W-token chunk already appeared in an
    earlier surviving doc is removed by stage 3 (and only stage 3)."""
    from crypto_etl_pipeline_spark.queries.text import PARA_W

    # doc 0: 2*PARA_W distinct tokens; doc 1: the SAME chunks swapped
    # (chunk-level dup, doc-level Jaccard of shingles crossing the
    # boundary differs enough to dodge the 0.05-threshold near-dup
    # stage being the remover — assert stagewise below either way)
    c1 = " ".join(f"alpha{i}" for i in range(PARA_W))
    c2 = " ".join(f"beta{i}" for i in range(PARA_W))
    rows = [
        (0, f"{c1} {c2}", "en", "src0", 100),
        (1, f"{c2} {c1}", "en", "src0", 100),
        (2, "an unrelated document about glacier melt and alpine hydrology patterns", "en", "src1", 70),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    out = {r["stage"]: r for r in REGISTRY["dedup_cascade_report"].fn(spark, sf_dir).collect()}
    # nothing exact-duplicated
    assert out[1]["docs_removed"] == 0
    # doc 1 is removed by near-dup (chunk-swap keeps shingle Jaccard
    # high) or, if it survives pairing, by the paragraph stage — the
    # cascade's TOTAL must account for it exactly once
    assert out[3]["docs_out"] == 2
    assert out[2]["docs_removed"] + out[3]["docs_removed"] == 1


def test_simhash_capped_twin_on_mega_cluster(spark, tmp_path):
    """A near-identical block floods every band bucket (hamming-0/1
    twins collide in all 4 bands): the capped twin must drop the
    block's C(f,2) candidate mass, keep an independent small pair
    whose buckets are under the cap, and the spill audit must name the
    flooded buckets — with Spark/DuckDB agreeing on all three."""
    import duckdb as _duck

    from crypto_etl_pipeline_spark.queries.text import SIMHASH_BUCKET_CAP

    sf_dir = _cascade_fixture(spark, tmp_path)  # 24-doc boiler block + pairs
    uncapped = REGISTRY["dedup_simhash_banded_pairs"].fn(spark, sf_dir)
    capped_spec = REGISTRY["dedup_simhash_banded_pairs_capped"]
    capped = capped_spec.fn(spark, sf_dir).collect()
    spill = REGISTRY["dedup_simhash_hot_bucket_spill"].fn(spark, sf_dir).collect()

    # the boiler block is one near-identical cluster: uncapped retrieves
    # its (large) within-block hamming<=3 mass — not the full C(24,2),
    # since a one-token swap among ~48 tokens flips a few low-margin
    # sign-sum bits and some marker pairs land past hamming 3 — and
    # the capped twin drops all of it
    n_uncapped = uncapped.count()
    assert n_uncapped >= 50
    # cap semantics: a pair is dropped iff EVERY band it collides in is
    # flooded — block pairs that also collide in an under-cap band
    # survive, so capped is a strict SUBSET, not block-free
    uncapped_ids = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    capped_ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert capped_ids < uncapped_ids
    # every flooded bucket is audited with exact C(n,2) accounting
    assert len(spill) >= 1
    for r in spill:
        assert r["n_ids"] > SIMHASH_BUCKET_CAP
        assert r["skipped_comparisons"] == r["n_ids"] * (r["n_ids"] - 1) // 2

    # engaged-cap cross-engine parity on this fixture
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    drows = {
        (r[0], r[1]): r[2] for r in con.execute(capped_spec.oracle).fetchall()
    }
    assert {(a, b) for a, b in drows} == capped_ids


def test_lsh_capped_twin_on_mega_cluster(spark, tmp_path):
    """LSH buckets key on the md5 of the full band signature, so the
    near-identical block floods them exactly like the simhash case:
    spill non-empty with exact C(n,2) accounting, capped a strict
    subset of uncapped, engaged-cap cross-engine parity."""
    import duckdb as _duck

    from crypto_etl_pipeline_spark.queries.text import MINHASH_BUCKET_CAP

    sf_dir = _cascade_fixture(spark, tmp_path)
    uncapped_ids = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    capped_spec = REGISTRY["dedup_minhash_lsh_capped"]
    capped_ids = {
        (r["id_a"], r["id_b"]) for r in capped_spec.fn(spark, sf_dir).collect()
    }
    spill = REGISTRY["dedup_lsh_hot_bucket_spill"].fn(spark, sf_dir).collect()

    # the 24-doc block pairs at jaccard ~1 in the uncapped feed
    assert len(uncapped_ids) >= (_BOILER_N * (_BOILER_N - 1)) // 2
    assert capped_ids < uncapped_ids
    # per-band occupancy profile: one row per band, flooded buckets
    # visible as hot count + absorbed C(n,2) mass; bands without hot
    # buckets carry zero spill (never NULL)
    assert len(spill) >= 1
    assert any(r["n_hot_buckets"] > 0 for r in spill)
    for r in spill:
        if r["n_hot_buckets"] > 0:
            assert r["max_occupancy"] > MINHASH_BUCKET_CAP
            assert r["skipped_comparisons"] >= (
                (MINHASH_BUCKET_CAP + 1) * MINHASH_BUCKET_CAP // 2
            )
        else:
            assert r["skipped_comparisons"] == 0

    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    drows = {(r[0], r[1]) for r in con.execute(capped_spec.oracle).fetchall()}
    assert drows == capped_ids


def test_ivf_pq_hybrid_recall_vs_exact_l2(spark):
    """The IVF+PQ hybrid is doubly approximate (coarse cells prune,
    codes rank): the oracle pins the algorithm, this pins its quality —
    recall@10 of the probe-restricted ADC + exact re-rank against the
    exact L2 top-10. Measured 0.90-0.92 at sf0.001/sf0.01 — the IVF
    restriction slightly IMPROVES on PQ-alone's 0.85-0.90 here, because
    the probe set removes far-away vectors whose quantized codes
    otherwise crowd the ADC shortlist. Deterministic, no RNG."""
    import numpy as np
    import pyarrow.parquet as pa_pq

    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_ivf_pq_topk"].fn(spark, SF_GATE).collect()
    }
    t = pa_pq.read_table(f"{SF_GATE}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    exact = set()
    for qid in range(10):
        qi = int(np.where(ids == qid)[0][0])
        d = ((X[qi] - X) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        picked = 0
        for j in order:
            if ids[j] == qid:
                continue
            exact.add((qid, int(ids[j])))
            picked += 1
            if picked == 10:
                break
    assert len(got) == len(exact) == 100
    assert len(got & exact) / len(exact) >= 0.8


def test_ivf_incremental_equals_batch_restricted(spark):
    """The incremental-ingest contract: assigning the new batch against
    the PERSISTED store's centroids must equal the full-corpus batch
    assignment restricted to the new ids — and the centroids must come
    from the OLD corpus only (this is the regression: building them
    from old ∪ new would silently drift every future assignment)."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.operators.similarity import (
        ivf_assign_cells,
        ivf_build_centroids,
    )
    from crypto_etl_pipeline_spark.queries.vector import IVF_K
    from crypto_etl_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, SF_GATE, "embeddings")
    old = emb.where(F.col("vec_id") % 2 == 0)
    cents_old = ivf_build_centroids(old, k=IVF_K, iters=0)

    inc = {
        (r["vec_id"], r["cell"])
        for r in REGISTRY["ann_ivf_incremental_assign"].fn(spark, SF_GATE).collect()
    }
    batch = {
        (r["neighbor_id"], int(r["_cell"]))
        for r in ivf_assign_cells(emb, cents_old).collect()
        if r["neighbor_id"] % 2 == 1
    }
    assert inc == batch
    # centroid provenance: the store's seeds are the IVF_K lowest EVEN
    # ids — different from the full-corpus seeds (lowest ids overall),
    # so equality above would break if the query retrained on old ∪ new
    cents_full = ivf_build_centroids(emb, k=IVF_K, iters=0)
    assert cents_old != cents_full


def test_doremi_update_direction_and_normalization(spark):
    """The mix-update algebra: old and new weights each sum to 1, and
    the update moves weight TOWARD sources whose mean loss exceeds the
    corpus mean (the DoReMi direction) and away from the easy ones."""
    rows = REGISTRY["corpus_mix_doremi_update"].fn(spark, SF_GATE).collect()
    assert len(rows) >= 2
    assert sum(r["w_old"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["w_new"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        if r["excess_loss"] > 1e-6:
            assert r["w_new"] > r["w_old"] * (1 + 1e-9) or r["w_new"] >= r["w_old"]
        elif r["excess_loss"] < -1e-6:
            assert r["w_new"] < r["w_old"] + 1e-9
    # somebody must actually move (the proxy loss is not constant)
    assert any(abs(r["w_new"] - r["w_old"]) > 1e-7 for r in rows)


def test_prune_removes_cap_work(spark, tmp_path):
    """VERDICT r8 task #7: on a boilerplate-flooded corpus the upstream
    prune must remove (here: ALL of) the comparisons the df-cap would
    otherwise absorb, and the full-variant spill must be positive —
    the measured form of shingle_posting_pairs' prune-upstream claim."""
    sf_dir = _cascade_fixture(spark, tmp_path)  # 24 boilerplate + 2 normal
    rows = {r["variant"]: r for r in REGISTRY["dedup_prune_vs_cap_report"].fn(spark, sf_dir).collect()}
    full, pruned = rows["full"], rows["pruned"]
    assert full["n_docs"] == 28
    # the boilerplate block floods the 3-shingle postings past the cap
    assert full["skipped_comparisons"] > 0
    # prune drops every >=30%-boilerplate doc: the whole block AND the
    # near-dup pair (its 5-grams all have df 2) — only the two
    # no-shared-grams docs survive
    assert pruned["n_docs"] == 2
    assert pruned["skipped_comparisons"] == 0
    assert pruned["n_hot_shingles"] == 0
