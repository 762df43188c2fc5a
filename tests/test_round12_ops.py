"""Round-12 operator tests: ExactSubstr hot-gram skew guard (the
groupBy + join-back shape replacing count-over-window-by-gram),
Unicode canonicalization cross-engine parity, the global_ntile range
rank, the corpus-scaled SemDeDup cell count, and the persisted-IVF
build/probe split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries import REGISTRY

SF_GATE = "/root/testdata/sf0.01"


# --- ExactSubstr hot-gram skew guard (VERDICT r11 task #3) -------------------


def _hot_gram_corpus(spark, n_docs=50, toks_per_doc=2000):
    """The adversarial shape the r11 verdict named: ONE gram (a token
    repeated everywhere — license-header boilerplate) occurring
    n_docs * (toks_per_doc - 9) ~ 1e5 times. Under the old
    count-over-window-by-gram plan every one of those positions lands
    on a single window task; the groupBy + join-back plan collapses
    them to one count row per map task before any shuffle."""
    rows = [(i, " ".join(["tok"] * toks_per_doc)) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substr_no_per_gram_window(spark):
    """Plan invariant (greppable version of the skew fix): no Window
    node in the ExactSubstr plans partitions by the gram column — the
    only windows left are the per-doc island merges. A window keyed on
    _gram has no map-side combine and AQE cannot split it, so one
    boilerplate gram serializes the stage at 100x."""
    from crypto_etl_pipeline_spark.operators.dedup import (
        exact_repeated_substrings,
        exact_repeated_substrings_excise,
    )

    docs = _hot_gram_corpus(spark, n_docs=4, toks_per_doc=40)
    for build in (exact_repeated_substrings, exact_repeated_substrings_excise):
        plan = build(docs)._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line:
                assert "_gram" not in line, (
                    f"{build.__name__} still windows by gram:\n{line}"
                )


def test_exact_substr_hot_gram_bounded(spark):
    """Correctness on the 1e5-occurrence single-gram corpus: every doc
    is one maximal span covering the whole doc, min_occ equals the
    corpus-wide window count, and the excise keeps exactly one
    surviving window's tokens (the corpus-first occurrence)."""
    from crypto_etl_pipeline_spark.operators.dedup import (
        exact_repeated_substrings,
        exact_repeated_substrings_excise,
    )

    n_docs, toks = 50, 2000
    docs = _hot_gram_corpus(spark, n_docs, toks)
    spans = exact_repeated_substrings(docs).collect()
    assert len(spans) == n_docs
    n_windows_total = n_docs * (toks - 9)
    for r in spans:
        assert r["span_start"] == 1
        assert r["span_tokens"] == toks
        assert r["n_windows"] == toks - 9
        assert r["min_occ"] == n_windows_total
    ex = {r["doc_id"]: r for r in exact_repeated_substrings_excise(docs).collect()}
    assert len(ex) == n_docs
    # corpus-first window lives in doc 0 positions 1..10: doc 0 keeps
    # those 10 tokens, every other doc is fully excised (NULL text)
    assert ex[0]["n_removed"] == toks - 10
    assert ex[0]["clean_text"] == " ".join(["tok"] * 10)
    for i in range(1, n_docs):
        assert ex[i]["n_removed"] == toks
        assert ex[i]["clean_text"] is None


# --- Unicode canonicalization (VERDICT r11 task #8) --------------------------


@pytest.mark.quick
def test_unicode_canonical_cross_engine_parity(spark):
    """The fold chain (NFC + compatibility fold + lower + collapse)
    must agree byte-for-byte between the Spark column expression and
    the DuckDB SQL generated from the same fold tables — on NFD
    decompositions, full-width ASCII, typographic punctuation, exotic
    spaces, ligatures, and plain ASCII."""
    import duckdb

    from crypto_etl_pipeline_spark.operators.unicodeops import (
        canonical_sql,
        unicode_canonical,
    )

    fixtures = [
        "Hello W" + chr(0xF3) + "rld" + chr(0x2026) + " " + chr(0xFB01) + "ne",
        "e" + chr(0x0301) + "clair " + chr(0x2014) + " " + "ＴＥＳＴ",
        "a" + chr(0x00A0) + "b" + chr(0x3000) + "c   d",
        chr(0x201C) + "quoted" + chr(0x201D) + " " + chr(0x2018) + "q" + chr(0x2019),
        "plain ascii text",
        "",
        # r12 ADVICE: \x0B is in Java regex's \s but NOT in RE2's —
        # the explicit _WS_CLASS must collapse it identically in both
        "a\x0bb \x0b\x0b c\t\x0b\nd",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(fixtures)], "i long, s string")
    got = {
        r["i"]: r["c"]
        for r in df.select("i", unicode_canonical(F.col("s")).alias("c")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(fixtures):
        want = con.execute(f"SELECT {canonical_sql('?')}", [s]).fetchone()[0]
        assert got[i] == want, (i, repr(got[i]), repr(want))


@pytest.mark.quick
def test_unicode_dedup_rate_delta(spark):
    """The payoff invariant on the mixed-encoding corpus: for every
    source, the unicode-canonical fingerprint count must be at most a
    third of the byte-normalized count x3 variants — i.e. the three
    encodings of each doc collapse to ONE canonical fingerprint while
    the byte normalizer keeps (nearly) all of them apart."""
    rows = REGISTRY["dedup_unicode_fingerprint"].fn(spark, SF_GATE).collect()
    assert rows
    for r in rows:
        assert r["n_variants"] % 3 == 0
        # all three encodings collapse: canonical fps == docs per source
        assert r["fps_unicode"] == r["n_variants"] // 3
        # the byte normalizer keeps the NFD and fullwidth/NBSP variants
        # apart from the precomposed one (texts contain e/o/space)
        assert r["fps_byte_norm"] == r["n_variants"]


# --- global_ntile (VERDICT r11 task #5) --------------------------------------


@pytest.mark.quick
def test_global_ntile_matches_window_ntile(spark):
    """Bit-parity with Spark's window ntile on a unique order key, for
    bucket counts that divide and don't divide n (ntile's first n%k
    buckets take the extra row), ascending and descending keys."""
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.operators.sampling import global_ntile

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(101)], "id long, v long"
    ).localCheckpoint(eager=False)
    for k in (4, 10, 7):
        for order in ([F.asc("v"), F.asc("id")], [F.desc("v"), F.asc("id")]):
            want = {
                (r["id"]): r["b"]
                for r in df.withColumn(
                    "b", F.ntile(k).over(Window.orderBy(*order))
                ).collect()
            }
            got = {
                r["id"]: r["b"]
                for r in global_ntile(df, k, order, out_col="b").collect()
            }
            assert got == want, (k, order)


# --- corpus-scaled SemDeDup cell count (VERDICT r11 task #6) -----------------


@pytest.mark.quick
def test_sem_k_scales_with_corpus():
    """k = max(16, ceil(n/128)): fixed floor at every driver-compared
    SF (n <= 2000), grows linearly past it so mean cell size stays
    ~SEM_TARGET_CELL instead of n/16."""
    from crypto_etl_pipeline_spark.queries.vector import (
        SEM_K_MIN,
        SEM_TARGET_CELL,
        sem_k,
    )

    assert sem_k(500) == SEM_K_MIN
    assert sem_k(2000) == SEM_K_MIN
    assert sem_k(2049) == 17
    assert sem_k(65536) == 65536 // SEM_TARGET_CELL
    # mean cell size is bounded by the target once past the floor
    for n in (10_000, 1_000_000, 50_000_000):
        assert n / sem_k(n) <= SEM_TARGET_CELL


# --- persisted-IVF build/probe split (VERDICT r11 task #4) -------------------


def test_ivf_probe_only_reuses_persisted_index(spark):
    """The probe query must NOT rebuild the index on a warm process:
    the memo hands back the same path, and the probe result matches
    ann_ivf_topk bit-for-bit (shared oracle contract)."""
    from crypto_etl_pipeline_spark.queries import vector as V

    sf = "/root/testdata/sf0.001"
    V._IVF_INDEX_MEMO.pop(sf, None)
    REGISTRY["ann_ivf_probe_only"].fn(spark, sf).collect()
    path1 = V._IVF_INDEX_MEMO[sf][0]
    probe = REGISTRY["ann_ivf_probe_only"].fn(spark, sf)
    assert V._IVF_INDEX_MEMO[sf][0] == path1, "warm probe rebuilt the index"
    exact = REGISTRY["ann_ivf_topk"].fn(spark, sf)
    assert sorted(map(tuple, probe.collect())) == sorted(map(tuple, exact.collect()))


def test_ivf_index_build_reports_full_partition(spark):
    """The build query's per-cell histogram covers the whole corpus
    and the persisted layout is partitioned by cell id."""
    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["ann_ivf_index_build"].fn(spark, sf).collect()
    assert sum(r["n_vecs"] for r in rows) == 500
    from crypto_etl_pipeline_spark.queries import vector as V

    path = V._IVF_INDEX_MEMO[sf][0]
    import os

    assert any(d.startswith("_cell=") for d in os.listdir(path))


# --- script histogram + mojibake audit (round-12 second wave) ----------------


@pytest.mark.quick
def test_script_histogram_classifies_injected_scripts(spark):
    """The md5-parity transliteration must move mass into exactly the
    expected classes: every script class is populated corpus-wide,
    Latin stays dominant per source (only vowels move), and the hash
    class is decorrelated from source (a 25-doc source may legitimately
    miss one class — the old doc_id%4 scheme instead correlated
    PERFECTLY with source=doc_id%20, which this test would catch)."""
    rows = REGISTRY["text_script_histogram"].fn(spark, SF_GATE).collect()
    assert rows
    tot = {k: 0 for k in ("cyrillic_chars", "greek_chars", "cjk_chars")}
    n_src_with = {k: 0 for k in tot}
    for r in rows:
        assert r["dominant_script"] == "latin"
        assert r["latin_chars"] > r["cyrillic_chars"]
        for k in tot:
            tot[k] += r[k]
            n_src_with[k] += int(r[k] > 0)
    assert all(v > 0 for v in tot.values()), tot
    # decorrelation: each class present in MOST sources (the modulus
    # scheme put each class in exactly 1/4 of sources)
    assert all(v >= len(rows) * 0.7 for v in n_src_with.values()), n_src_with


@pytest.mark.quick
def test_mojibake_audit_flags_exactly_the_injected_classes(spark):
    """md5-class in {0,1,2} is corrupted, {3,4} clean: corpus-wide
    flag rate ~0.6, all three signals positive corpus-wide, FFFD
    exactly 2 per affected doc, and no source 100% flagged."""
    rows = REGISTRY["quality_mojibake_audit"].fn(spark, SF_GATE).collect()
    assert rows
    n_docs = sum(r["n_docs"] for r in rows)
    n_flagged = sum(r["n_flagged"] for r in rows)
    for r in rows:
        assert r["n_flagged"] < r["n_docs"]
        assert r["fffd_chars"] % 2 == 0  # two U+FFFD per affected doc
    assert sum(r["fffd_chars"] for r in rows) > 0
    assert sum(r["c1_chars"] for r in rows) > 0
    assert sum(r["mojibake_pairs"] for r in rows) > 0
    assert abs(n_flagged / n_docs - 0.6) < 0.15


# --- multilingual curation funnel --------------------------------------------


def test_multilingual_funnel_invariants(spark):
    """Funnel algebra over the 5 stages x sources (r13 inserts the
    per-URL dedup stage between the encoding filter and content
    dedup): rows and chars are non-increasing through stages
    0->1->2->3 (filter, URL dedup, content dedup), stage 2 collapses
    the enc-0/1 refetch pair while keeping the enc-2 mirror (so at
    most 2 rows per original document), stage 3 keeps at most one row
    per original document, stage 4's sequence count is the exact
    ceil-div of its token mass, and every source appears at every
    stage."""
    rows = REGISTRY["pipeline_multilingual_curation"].fn(spark, SF_GATE).collect()
    stages = {}
    for r in rows:
        stages.setdefault(r["source"], {})[r["stage"]] = r
    assert stages
    for src, by_stage in stages.items():
        assert sorted(by_stage) == [0, 1, 2, 3, 4], src
        s0, s1, s2, s3, s4 = (by_stage[i] for i in range(5))
        assert s0["n_rows"] >= s1["n_rows"] >= s2["n_rows"] >= s3["n_rows"] > 0
        assert s0["n_chars"] >= s1["n_chars"] >= s2["n_chars"] >= s3["n_chars"]
        assert s0["n_rows"] % 3 == 0  # 3 fetch variants per doc at ingest
        n_docs = s0["n_rows"] // 3
        assert s2["n_rows"] <= 2 * n_docs  # refetches collapsed by URL
        assert s3["n_rows"] <= n_docs  # mirrors collapsed by content
        # sequences: sum of per-doc ceil(tok/128) is between
        # ceil(total/128) and n_docs (each doc >= 1 sequence)
        assert s4["n_rows"] >= (s4["n_chars"] + 127) // 128
        assert s4["n_rows"] >= s3["n_rows"]
