"""Round 8: hot-shingle DF cap for the EXACT posting pair feed.

VERDICT r7 "What's wrong" #1: the shared exact shingle-posting pair
feed had no hot-shingle guard — a shingle appearing in *f* docs
contributes C(f, 2) join rows on ONE shuffle key, so a boilerplate-
heavy corpus (license headers, templated pages — the case a real 100 TB
crawl hits and the disjoint-replica scale fixture cannot) turns the
"sparse" posting join quadratic on a single partition.

Adversarial fixture: one boilerplate sentence shared by a large block
of documents, plus a genuine near-dup pair whose overlap is ordinary
(low-DF) shingles. The cap must absorb the quadratic boilerplate mass,
keep the genuine pair, report exactly what it spilled, and agree with
the DuckDB oracle ON THIS FIXTURE (where capped != uncapped — the
sf0.01 gate data happens to produce identical outputs either way, so
this is the non-vacuous parity check for the capped semantics).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.dedup import (
    hot_shingle_spill,
    shingle_posting_pairs,
)
from crypto_etl_pipeline_spark.queries import REGISTRY
from crypto_etl_pipeline_spark.queries.text import HOT_SHINGLE_DF_CAP

#: 6 tokens -> 4 pure-boilerplate shingles (n=3) shared by every member
BOILER = "licensed under the apache license v2"
N_BOILER = 30
#: genuine near-dups: 11 shared tokens + unique last token — their
#: shared shingles have DF=2, far under any sane cap
NEAR_A = "quick brown foxes jump over lazy dogs near quiet river banks dawn"
NEAR_B = "quick brown foxes jump over lazy dogs near quiet river banks dusk"


def _skew_corpus(spark):
    rows = []
    for i in range(N_BOILER):
        # per-doc unique filler AFTER the boilerplate: boundary shingles
        # are unique per doc, the 4 interior boiler shingles have DF=30
        filler = f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f"
        rows.append((i, "en", f"{BOILER} {filler}", "web"))
    rows.append((100, "en", NEAR_A, "web"))
    rows.append((101, "en", NEAR_B, "forum"))
    for i in range(200, 208):
        rows.append((i, "en", f"o{i}a o{i}b o{i}c o{i}d o{i}e o{i}f o{i}g", "web"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    )


N_BOILER_PAIRS = N_BOILER * (N_BOILER - 1) // 2


def test_uncapped_blowup_vs_capped_flatness(spark):
    docs = _skew_corpus(spark)
    uncapped = shingle_posting_pairs(docs, block_col="lang").collect()
    # the quadratic mass is real: every boilerplate pair materializes
    boiler_pairs = [r for r in uncapped if r["id_a"] < N_BOILER and r["id_b"] < N_BOILER]
    assert len(boiler_pairs) == N_BOILER_PAIRS
    assert all(r["inter"] == 4 for r in boiler_pairs)

    capped = shingle_posting_pairs(
        docs, block_col="lang", shingle_df_cap=HOT_SHINGLE_DF_CAP
    ).collect()
    # the cap absorbs ALL of it: the only surviving pair is the genuine
    # near-dup, whose shingles are DF=2
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}
    (near,) = capped
    # inter unchanged for the genuine pair (none of its shingles is hot)
    assert near["inter"] == 9 and near["size_a"] == near["size_b"] == 10


def test_hot_shingle_spill_metric(spark):
    docs = _skew_corpus(spark)
    spill = hot_shingle_spill(
        docs, shingle_df_cap=HOT_SHINGLE_DF_CAP, block_col="lang"
    ).collect()
    # exactly the 4 interior boilerplate shingles, nothing else
    assert len(spill) == 4
    assert all(r["df"] == N_BOILER for r in spill)
    assert all(r["skipped_comparisons"] == N_BOILER_PAIRS for r in spill)
    toks = BOILER.split()
    expected = {"_".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert {r["shingle"] for r in spill} == expected


def test_capped_join_fanout_is_bounded_by_construction(spark):
    """Per-shingle posting length after the cap is <= cap, so per-key
    join fan-out is <= C(cap, 2) regardless of corpus skew — the
    invariant that makes the capped feed safe at 100 TB."""
    docs = _skew_corpus(spark)
    from pyspark.sql.window import Window

    sh = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(split(text, '\\\\s+')) - 3),"
                    " i -> concat_ws('_', split(text, '\\\\s+')[i],"
                    " split(text, '\\\\s+')[i+1], split(text, '\\\\s+')[i+2]))"
                )
            )
        ).alias("_g"),
    )
    w = Window.partitionBy("lang", "_g")
    capped_df = (
        sh.withColumn("_df", F.count(F.lit(1)).over(w))
        .where(F.col("_df") <= HOT_SHINGLE_DF_CAP)
        .groupBy("lang", "_g")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df").alias("max_df"))
        .collect()[0]["max_df"]
    )
    assert capped_df <= HOT_SHINGLE_DF_CAP


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_jaccard_pairs_capped",
        "source_overlap_matrix_capped",
        "split_leakage_audit_capped",
        "dedup_hot_shingle_spill",
    ],
)
def test_capped_oracle_parity_on_skew_fixture(spark, tmp_path, name):
    """Driver-gate-shaped parity ON THE ADVERSARIAL FIXTURE, where the
    capped output genuinely differs from the uncapped one — proving the
    Spark cap and the oracle's DF filter implement the same semantics
    (at the gate SFs the two coincide, which would let a no-op cap
    pass)."""
    docs = _skew_corpus(spark)
    path = os.path.join(tmp_path, "documents.parquet")
    docs.toPandas().to_parquet(path)

    got = REGISTRY[name].fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = con.execute(REGISTRY[name].oracle).df()
    con.close()

    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    got_rows = sorted(map(tuple, got[cols].itertuples(index=False)))
    want_rows = sorted(map(tuple, want[cols].itertuples(index=False)))
    assert got_rows == want_rows


def test_capped_differs_from_uncapped_on_skew_fixture(spark, tmp_path):
    """Non-vacuity: on the boilerplate fixture the capped pair set is a
    strict subset — the guard demonstrably changes the answer here,
    so the parity test above is testing the cap, not a no-op."""
    docs = _skew_corpus(spark)
    path = os.path.join(tmp_path, "documents.parquet")
    docs.toPandas().to_parquet(path)
    exact = REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, str(tmp_path))
    capped = REGISTRY["dedup_ngram_jaccard_pairs_capped"].fn(spark, str(tmp_path))
    n_exact, n_capped = exact.count(), capped.count()
    assert n_exact >= N_BOILER_PAIRS + 1
    assert n_capped == 1


# --- ADVICE r7 regression tests -------------------------------------------


def test_lsh_sweep_emits_all_configs_on_dupless_corpus(spark, tmp_path):
    """A corpus with no near-dups yields ZERO LSH candidates for every
    config; the sweep must still emit one row per config with
    n_candidates=0 (the oracle's per-config UNION ALL always does) —
    previously the groupBy over an empty candidate set dropped the
    rows entirely."""
    rows = [
        (i, "en", f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h", "web")
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    )
    path = os.path.join(tmp_path, "documents.parquet")
    docs.toPandas().to_parquet(path)
    got = {
        r["bands"]: r
        for r in REGISTRY["dedup_lsh_parameter_sweep"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {4, 8, 16}, "one row per config even with zero candidates"
    for b, r in got.items():
        assert r["n_candidates"] == 0 and r["n_verified"] == 0
        assert r["n_truth"] == 0
        assert r["precision"] is None
        assert r["rows_per_band"] == 32 // b


def test_footer_audit_survives_missing_statistics(spark, tmp_path):
    """A writer that omits column statistics is exactly the malformed
    case the audit exists to catch — it must surface missing-stats
    chunks as n_missing_stats > 0 with null min/max, not crash the
    executor on float(None)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "l_extendedprice": [1.5, 2.5, 3.5],
            "l_quantity": [1.0, 2.0, 3.0],
            "l_discount": [0.1, 0.2, 0.3],
            "l_tax": [0.01, 0.02, 0.03],
        }
    )
    path = os.path.join(tmp_path, "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), path, write_statistics=False)

    rows = {
        r["column_name"]: r
        for r in REGISTRY["parquet_footer_stats_audit"].fn(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"l_extendedprice", "l_quantity", "l_discount", "l_tax"}
    for r in rows.values():
        assert r["n_missing_stats"] >= 1, "stats-less chunk must be reported"
        assert r["min_value"] is None and r["max_value"] is None
        assert r["num_values"] == 3


def test_calibration_floor_div_handles_negative_shifted_values(spark):
    """The bin expression must FLOOR (DuckDB // semantics), not
    truncate, for margins below -_CAL_SHIFT/1000 — the pmod form is
    sign-safe in exact integer arithmetic."""
    import math

    from crypto_etl_pipeline_spark.queries.selection import _CAL_BIN_MILLI, _CAL_SHIFT

    margins = [-250.0, -150.3, -100.2501, -100.0, -0.01, 0.0, 42.73, 199.999]
    df = spark.createDataFrame([(m,) for m in margins], "margin double")
    shifted = f"(CAST(round(margin * 1000, 0) AS BIGINT) + {_CAL_SHIFT})"
    got = [
        r["bin"]
        for r in df.select(
            F.expr(
                f"({shifted} - pmod({shifted}, {_CAL_BIN_MILLI})) div {_CAL_BIN_MILLI}"
            ).alias("bin")
        ).collect()
    ]
    want = [
        math.floor((round(m * 1000) + _CAL_SHIFT) / _CAL_BIN_MILLI) for m in margins
    ]
    assert got == want


# --- sampled (driver-loop-free) k-center -----------------------------------


def test_kcenter_sampled_assign_python_replay(spark):
    """Independent full replay in pure Python (not the DuckDB oracle):
    hash-ordered fixed-size sample -> Gonzalez greedy -> nearest-center
    assignment -> per-center rollup must match the distributed plan
    bit-for-bit (exact quantized-integer distances)."""
    import hashlib
    import math

    from crypto_etl_pipeline_spark.queries.selection import (
        _KC_SALT,
        _KC_SAMPLE_N,
        K_CENTERS,
        _SCALE,
    )

    SF = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in REGISTRY["kcenter_sampled_assign"].fn(spark, SF).collect()
    )

    import pandas as pd

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [math.floor(float(x) * _SCALE) for x in r.embedding]
        for r in emb.itertuples()
    }

    def gate(vid: int) -> int:
        h = hashlib.md5(f"{vid}{_KC_SALT}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    sample = sorted(vecs, key=lambda v: (gate(v), v))[:_KC_SAMPLE_N]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    centers = [min(sample)]
    dmin = {v: d2(vecs[v], vecs[centers[0]]) for v in sample}
    for _ in range(1, K_CENTERS):
        far = max(sample, key=lambda v: (dmin[v], -v))
        centers.append(far)
        for v in sample:
            dmin[v] = min(dmin[v], d2(vecs[v], vecs[far]))

    assign: dict[int, list] = {}
    for vid, q in vecs.items():
        best = min(
            (d2(q, vecs[c]), i) for i, c in enumerate(centers)
        )
        assign.setdefault(best[1], []).append(best[0])
    want = sorted(
        (i, centers[i], len(ds), max(ds)) for i, ds in assign.items()
    )
    assert got == want
    assert sum(r[2] for r in got) == len(vecs)


# --- banded SimHash pairs ----------------------------------------------------


def test_simhash_banded_pairs_pigeonhole_exact(spark):
    """The banding must retrieve EXACTLY the hamming<=k pair set (the
    pigeonhole guarantee, not an s-curve approximation): brute-force
    all-pairs popcount over the collected signatures is the truth."""
    from crypto_etl_pipeline_spark.queries.text import SIMHASH_HAM_K

    SF = "/root/testdata/sf0.001"
    sigs = {
        int(r["doc_id"]): int(r["simhash"])
        for r in REGISTRY["dedup_simhash"].fn(spark, SF).collect()
    }
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= SIMHASH_HAM_K:
                want.add((a, b, h))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in REGISTRY["dedup_simhash_banded_pairs"].fn(spark, SF).collect()
    }
    assert got == want
    assert want, "fixture must contain at least one hamming<=k pair"


# --- paragraph first-wins dedup + cascade funnel ----------------------------


def test_paragraph_dedup_conservation_and_first_wins(spark):
    from crypto_etl_pipeline_spark.queries.text import PARA_W

    SF = "/root/testdata/sf0.001"
    rows = {r["doc_id"]: r for r in REGISTRY["dedup_paragraph_first_wins"].fn(spark, SF).collect()}
    # conservation per doc, and chunk count matches ceil(len/W)
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for r in rows.values():
        assert r["n_kept"] + r["n_dropped"] == r["n_paragraphs"]
    for t in docs.itertuples():
        n_tok = len(t.text.split())
        if n_tok:
            assert rows[t.doc_id]["n_paragraphs"] == (n_tok - 1) // PARA_W + 1
    # global: kept == number of distinct paragraph hashes
    import hashlib

    seen = {}
    for t in sorted(docs.itertuples(), key=lambda x: x.doc_id):
        toks = t.text.split()
        for i in range(0, (len(toks) - 1) // PARA_W + 1 if toks else 0):
            h = hashlib.md5(" ".join(toks[i * PARA_W : (i + 1) * PARA_W]).encode()).hexdigest()
            seen.setdefault(h, (t.doc_id, i))
    assert sum(r["n_kept"] for r in rows.values()) == len(seen)
    # first-wins: a duplicated paragraph is kept by exactly the lowest
    # (doc_id, idx) occurrence — assert via a constructed corpus
    two = spark.createDataFrame(
        [
            (1, "en", " ".join(f"w{i}" for i in range(PARA_W)), "web"),
            (2, "en", " ".join(f"w{i}" for i in range(PARA_W)), "web"),
        ],
        "doc_id long, lang string, text string, source string",
    )
    import os as _os

    tmp = "/tmp/para_dedup_fixture"
    _os.makedirs(tmp, exist_ok=True)
    two.toPandas().to_parquet(f"{tmp}/documents.parquet")
    out = {r["doc_id"]: r for r in REGISTRY["dedup_paragraph_first_wins"].fn(spark, tmp).collect()}
    assert out[1]["n_kept"] == 1 and out[1]["n_dropped"] == 0
    assert out[2]["n_kept"] == 0 and out[2]["n_dropped"] == 1


def test_cascade_report_stage_algebra(spark):
    SF = "/root/testdata/sf0.001"
    rows = {r["stage"]: r for r in REGISTRY["dedup_cascade_report"].fn(spark, SF).collect()}
    assert [rows[i]["stage_name"] for i in (0, 1, 2)] == [
        "raw", "exact_dedup", "near_dup_clusters",
    ]
    for i in (0, 1, 2):
        assert rows[i]["docs_in"] - rows[i]["docs_removed"] == rows[i]["docs_out"]
    assert rows[0]["docs_out"] == rows[1]["docs_in"]
    assert rows[1]["docs_out"] == rows[2]["docs_in"]
    # stage counts agree with the oracled building blocks
    n_exact = REGISTRY["dedup_exact"].fn(spark, SF).count()
    assert rows[1]["docs_out"] == n_exact
    assert rows[2]["docs_out"] <= rows[1]["docs_out"]


# --- MV rollup NULL-sum semantics (ADVICE r7 #3 regression) ------------------


def test_mv_rollup_all_null_group_drains_as_null_sum(spark, tmp_path):
    """A group whose values are ALL NULL must drain with sum_value NULL
    (SQL sum semantics, the batch-equivalence contract) — the merge
    used to coalesce NULL partials to 0.0. A group that gains a real
    value in a later batch must still fold correctly."""
    import datetime

    import pandas as pd

    from crypto_etl_pipeline_spark.queries.streaming import _checkpoint, _tmpdir
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_mv_rollup_stream,
    )

    t = datetime.datetime(2026, 8, 1, 10, 30)
    inp = str(tmp_path / "arrivals")
    import os as _os

    _os.makedirs(inp)
    # batch 1: 'allnull' group NULL-valued; 'mixed' group NULL-valued
    pd.DataFrame(
        {
            "ts": [t, t],
            "event_type": ["allnull", "mixed"],
            "value": [None, None],
        }
    ).to_parquet(f"{inp}/b1.parquet")
    # batch 2: 'allnull' stays NULL; 'mixed' gains a real value
    pd.DataFrame(
        {
            "ts": [t, t],
            "event_type": ["allnull", "mixed"],
            "value": [None, 7.5],
        }
    ).to_parquet(f"{inp}/b2.parquet")

    events = read_event_stream(spark, inp, max_files_per_trigger=1)
    out = {
        r["event_type"]: r
        for r in run_mv_rollup_stream(
            events, store_dir=_tmpdir("mvnull_"), checkpoint_dir=_checkpoint()
        ).collect()
    }
    assert out["allnull"]["n_events"] == 2
    assert out["allnull"]["sum_value"] is None
    assert out["allnull"]["min_value"] is None
    assert out["mixed"]["n_events"] == 2
    assert abs(out["mixed"]["sum_value"] - 7.5) < 1e-9


def test_paragraph_excise_rebuilds_and_nulls_fully_redundant(spark, tmp_path):
    from crypto_etl_pipeline_spark.queries.text import PARA_W

    text = " ".join(f"w{i}" for i in range(PARA_W))
    uniq = " ".join(f"u{i}" for i in range(PARA_W))
    docs = spark.createDataFrame(
        [
            (1, "en", text, "web"),          # keeps its one chunk
            (2, "en", f"{text} {uniq}", "web"),  # chunk0 dropped, chunk1 kept
            (3, "en", text, "web"),          # fully redundant -> NULL
        ],
        "doc_id long, lang string, text string, source string",
    )
    docs.toPandas().to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraph_excise"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1]["clean_text"] == text
    assert out[2]["clean_text"] == uniq and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] is None and out[3]["n_kept"] == 0
