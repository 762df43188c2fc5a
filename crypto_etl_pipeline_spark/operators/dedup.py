"""Deduplication operators (north-star extension, SURVEY.md §2.13).

Four tiers, all deterministic (no RNG at execution time):

- **Exact**: hash-groupBy on normalized text — one shuffle on the
  fingerprint; at 100 TB this is the classic dedup-by-key map-reduce.
- **MinHash + LSH banding**: k min-hashes from ``xxhash64(shingle, seed)``,
  banded into buckets; candidate pairs only form within a bucket
  (the shuffle is on (band, band_hash), so cost scales with duplicate
  density, not n^2), then verified with exact shingle Jaccard.
- **SimHash**: 60-bit sign-aggregated token hash; near-dups share most
  bits (hamming distance via popcount of xor).
- **Embedding cosine**: see operators/similarity.py.

All hash material derives from md5 + int64 arithmetic via
operators/phash.py, which is byte-identical in DuckDB — so MinHash,
SimHash, and the LSH candidate pipeline all carry full value-hash
DuckDB oracles (the winnow_fingerprints md5 precedent, generalized).
The Carter-Wegman multiply-mod fan-out means ONE md5 per shingle
feeds all ``num_hashes`` signature columns — cheaper than the previous
one-xxhash64-per-(shingle, i) formulation, and portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.phash import md5_long, universal_hash
from crypto_etl_pipeline_spark.operators.textops import (
    fingerprint_md5,
    jaccard,
    shingles,
    shingles_of,
    tokens,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (min id) per normalized-text fingerprint."""
    fp = fingerprint_md5(F.col(text_col))
    return (
        df.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("_fp")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature as ``num_hashes`` plain long columns.

    ``shingle_df`` lets a caller that ALSO needs the shingle sets (the
    Jaccard-verify stage of :func:`near_dup_pairs_minhash`) pass the one
    checkpointed ``_shingle_arrays`` table in, so tokenize/shingle/
    distinct genuinely run once — two separate ``localCheckpoint`` calls
    would materialize two distinct RDD lineages that ReuseExchange
    cannot dedup (it dedups exchanges, not LogicalRDDs).

    Shuffle-based formulation: explode shingles, hash each shingle ONCE
    (``md5_long``, portable to the DuckDB oracle), fan out to
    ``num_hashes`` flat Carter-Wegman columns ``(A[i]*x+B[i]) % P``,
    then ``groupBy(id).agg(min...)`` — map-side partial aggregation
    means the shuffle carries one num_hashes-wide row per
    (doc x partition), and every expression is a flat codegen-able
    function of an attribute.

    Deliberately NOT the nested higher-order-function formulation
    (``transform(sequence(..), i -> array_min(transform(sh, s -> hash))``):
    HOF lambdas are interpreted (no whole-stage codegen, no common-
    subexpression elimination), and any upstream expression referenced
    inside a lambda gets re-evaluated per lambda iteration after
    CollapseProject inlines it — measured ~40,000x re-evaluation of the
    tokenizer per row at 500 docs (minutes vs. milliseconds).

    Documents with fewer than ``shingle_n`` tokens produce no shingles
    and therefore no signature row — they cannot near-duplicate anything
    at this shingle size.

    The input is repartitioned by id before the explode: compact text
    tables arrive in few (often one) parquet splits, which would pin
    the hash computation — num_hashes x shingles per doc — to one core.
    Hash-partitioning on the id costs one tiny shuffle of the raw text
    and doubles as the groupBy(id) partitioning, so the aggregation
    that follows adds NO second exchange.
    """
    sh_tbl = shingle_df if shingle_df is not None else _shingle_arrays(df, text_col, id_col, shingle_n)
    sh = sh_tbl.select(F.col(id_col), F.explode(F.col("_sh")).alias("_shingle"))
    # md5 behind its own projection: the num_hashes mul-mod columns each
    # reference the attribute `_x`, so the md5 runs once per shingle.
    hashed = sh.select(id_col, md5_long(F.col("_shingle"), 8).alias("_x")).select(
        id_col, *[universal_hash(i, F.col("_x")).alias(f"h{i}") for i in range(num_hashes)]
    )
    return hashed.groupBy(id_col).agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)])


def _shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(id, _sh) — DISTINCT shingle array per doc, repartitioned by id.

    Order of operations matters twice here:

    1. Repartition FIRST, tokenize after: compact text tables arrive
       in one parquet split, and tokenization is the CPU-heavy step —
       computing it below the exchange would serialize it on one core
       (measured 7x at sf0.1 when tried the other way).
    2. The computed arrays are cached with a LAZY localCheckpoint so
       the two consumers in near_dup_pairs_minhash — signatures and
       Jaccard rehydration — share one tokenizer pass instead of each
       re-evaluating the projection above the reused exchange
       (ReuseExchange dedups exchanges, not projections). On a real
       cluster this is a persist(MEMORY_AND_DISK) decision sized to
       the corpus, same as any reuse point.

    Distinct shingles are equivalent for MinHash (min over a multiset
    == min over its support) and are exactly what Jaccard needs. The
    tokenizer sits behind its own projection so the shingle lambda
    references an attribute, not the split() expression (which would
    re-run per shingle position).
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.array_distinct(shingles_of(F.col("_toks"), shingle_n)).alias("_sh"),
        )
        .localCheckpoint(eager=False)
    )


def lsh_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """Band the signature columns into (id, band, bucket) rows.

    bucket = md5_long over the '|'-joined band slice of signature
    columns (portable: DuckDB rebuilds the identical string with
    ``string_agg(h::VARCHAR, '|' ORDER BY i)``) — flat column
    references, fully codegen'd; the downstream self-join shuffles on
    (band, bucket) so cost scales with collision density, never n^2.
    """
    rows_per_band = num_hashes // num_bands
    banded = signatures.select(
        id_col,
        *[
            md5_long(
                F.concat_ws(
                    "|",
                    *[F.col(f"h{b * rows_per_band + j}").cast("string") for j in range(rows_per_band)],
                ),
                15,
            ).alias(f"b{b}")
            for b in range(num_bands)
        ],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket"))
            for b in range(num_bands)
        ]
    )
    return banded.select(id_col, F.explode(pairs).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def cap_hot_buckets(buckets: DataFrame, bucket_cap: int) -> DataFrame:
    """Drop (band, bucket) groups larger than ``bucket_cap`` from a
    :func:`lsh_buckets` table.

    The LSH candidate join is quadratic WITHIN a bucket: a boilerplate-
    heavy corpus (license headers, templated pages) can land millions of
    documents in one bucket and turn the "sparse" candidate stage into
    an n² explosion on a single shuffle partition. The standard
    production mitigation is a per-bucket size cap: buckets above the
    cap are excluded from candidate generation entirely.

    Recall semantics (documented, not hidden): a pair is lost ONLY if
    every band it collides in is capped. Genuinely near-duplicate pairs
    collide in several of the ``num_bands`` bands, so the usual casualty
    is exactly the degenerate boilerplate cluster the cap exists to
    absorb — handle those with :func:`exact_dedup` upstream, which
    collapses identical texts at hash-groupBy cost. Use
    :func:`lsh_hot_buckets` to count what a cap would spill before
    choosing one.

    The count is a window over the same (band, bucket) partitioning the
    downstream candidate join shuffles on, so the cap adds no exchange
    of its own.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "bucket")
    return (
        buckets.withColumn("_bn", F.count(F.lit(1)).over(w))
        .where(F.col("_bn") <= bucket_cap)
        .drop("_bn")
    )


def lsh_hot_buckets(buckets: DataFrame, bucket_cap: int) -> DataFrame:
    """The spill metric for :func:`cap_hot_buckets`: (band, bucket,
    n_ids) for every bucket a cap of ``bucket_cap`` would drop, plus the
    implied number of skipped candidate comparisons — the observability
    half of the cap (a silent cap would read as full coverage)."""
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .where(F.col("n_ids") > bucket_cap)
        .withColumn(
            # integer `div` (not `/`): exact past 2^53, matching SQL's
            # integer floor division — same fix as hot_shingle_spill
            # (ADVICE r8 #1)
            "skipped_comparisons",
            F.expr("n_ids * (n_ids - 1) div 2"),
        )
    )


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    bucket_cap: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) pairs with id_a < id_b and
    jaccard >= threshold. Shuffles: the signature groupBy, the
    (band, bucket) self-join, and two small joins rehydrating shingle
    sets for the (sparse) candidate set — never an n^2 comparison.

    ``bucket_cap`` bounds the within-bucket quadratic blowup on
    boilerplate-heavy corpora — see :func:`cap_hot_buckets` for the
    exact drop/recall semantics and :func:`lsh_hot_buckets` for the
    spill metric.
    """
    buckets, sh_tbl = minhash_buckets(df, text_col, id_col, num_hashes, num_bands, shingle_n)
    if bucket_cap is not None:
        buckets = cap_hot_buckets(buckets, bucket_cap)
    return near_dup_pairs_from_buckets(buckets, sh_tbl, id_col, threshold)


def minhash_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The candidate-generation half of :func:`near_dup_pairs_minhash`,
    exposed so a caller that needs the bucket table for more than the
    pair join — the cascade report reads the :func:`lsh_hot_buckets`
    spill off the same frame — shares ONE tokenize/hash/band pass.
    Returns ``(buckets, shingle_table)``; feed both to
    :func:`near_dup_pairs_from_buckets` for the verified pairs."""
    sh_tbl = _shingle_arrays(df, text_col, id_col, shingle_n)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, shingle_df=sh_tbl)
    return lsh_buckets(sigs, id_col, num_hashes, num_bands), sh_tbl


def near_dup_pairs_from_buckets(
    buckets: DataFrame,
    sh_tbl: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate join + exact-Jaccard verification over a prebuilt
    (possibly capped) bucket table — the second half of
    :func:`near_dup_pairs_minhash`."""
    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # The SAME checkpointed shingle table feeds both the signature path
    # above and this Jaccard rehydration — one tokenizer pass, one
    # localCheckpoint RDD shared by both consumers.
    a = sh_tbl.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh_tbl.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


class MinhashStore:
    """Persisted MinHash fingerprint store — the state an INCREMENTAL
    dedup pipeline keeps between runs.

    Three tables, saved as parquet subdirectories of one store path:

    - ``sigs``     (id, h0..h{n-1}, ingest_batch)   — per-doc MinHash signatures
    - ``bands``    (id, band, bucket, ingest_batch) — LSH band table, the
      lookup side of the incremental candidate join
    - ``shingles`` (id, _sh, ingest_batch)          — distinct shingle sets,
      used for exact-Jaccard verification of candidates

    Every table carries an ``ingest_batch`` partition column and the
    parquet layout is partitioned by it, so persistence is APPEND-ONLY:
    a daily run writes only its own batch partition
    (:meth:`append_batch`, dynamic partition overwrite) and never
    rewrites the corpus fingerprint set — the round-4 store rewrote all
    three tables wholesale on every save, which re-scales persistence
    cost with corpus size and defeats the incremental path's point.
    Batch ids should be non-numeric-looking strings (e.g.
    ``batch_2026_08_14``) so parquet partition-value inference keeps
    the column a string.

    100 TB posture: ``bands`` is the hot lookup table — in production
    additionally bucket it by (band, bucket) so the incremental
    candidate join is shuffle-free on the store side. ``shingles`` is
    corpus-scale; a deployment that cannot afford it verifies
    candidates by signature-component agreement from ``sigs`` instead
    (estimate rather than exact Jaccard) — the store layout supports
    either. Small-file hygiene per batch partition is
    ``sources.sinks.compact_parquet``.
    """

    _TABLES = ("sigs", "bands", "shingles")

    def __init__(self, sigs: DataFrame, bands: DataFrame, shingles: DataFrame):
        self.sigs = sigs
        self.bands = bands
        self.shingles = shingles

    def _parts(self):
        return zip(self._TABLES, (self.sigs, self.bands, self.shingles))

    def save(self, path: str) -> None:
        """Full (bootstrap) write of every batch partition."""
        for name, df in self._parts():
            df.write.mode("overwrite").partitionBy("ingest_batch").parquet(
                f"{path}/{name}"
            )

    def append_batch(self, path: str, batch_id: str) -> None:
        """Persist ONLY ``batch_id``'s fingerprints into an existing
        store: dynamic partition overwrite touches just that batch's
        partition directory, so every other batch's files stay
        byte-for-byte untouched (asserted by
        tests/test_incremental_dedup.py) and re-running a failed batch
        is idempotent (its partition is replaced, not doubled)."""
        for name, df in self._parts():
            (
                df.where(F.col("ingest_batch") == batch_id)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(f"{path}/{name}")
            )

    @classmethod
    def load(cls, spark, path: str) -> "MinhashStore":
        return cls(
            sigs=spark.read.parquet(f"{path}/sigs"),
            bands=spark.read.parquet(f"{path}/bands"),
            shingles=spark.read.parquet(f"{path}/shingles"),
        )


def build_minhash_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    batch_id: str = "base",
) -> MinhashStore:
    """Fingerprint a corpus once into a :class:`MinhashStore`, tagged
    as ingest batch ``batch_id``.

    One shared shingle pass feeds signatures, bands, and the stored
    shingle sets (same single-tokenizer discipline as
    :func:`near_dup_pairs_minhash`)."""
    sh = _shingle_arrays(df, text_col, id_col, shingle_n)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, shingle_df=sh)
    bands = lsh_buckets(sigs, id_col, num_hashes, num_bands)
    tag = F.lit(batch_id).alias("ingest_batch")
    return MinhashStore(
        sigs=sigs.select("*", tag),
        bands=bands.select("*", tag),
        shingles=sh.select("*", tag),
    )


def incremental_near_dups(
    new_docs: DataFrame,
    store: MinhashStore,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    bucket_cap: int | None = None,
    batch_id: str = "delta",
) -> tuple[DataFrame, MinhashStore]:
    """Deduplicate NEW documents against a persisted fingerprint store.

    The batch path (:func:`near_dup_pairs_minhash`) refingerprints the
    whole corpus every run; a real 100 TB pipeline instead fingerprints
    only the day's new documents and JOINS their band table against the
    store — corpus-side work is a store lookup, never a recompute (the
    old documents' text is not even an input to this function).

    Returns ``(pairs, updated_store)`` where ``pairs`` is
    (id_a, id_b, jaccard) for every verified near-dup pair touching at
    least one new document (new-vs-store and new-vs-new; id_a < id_b),
    and ``updated_store`` unions the new fingerprints in, ready to
    persist for the next run.

    Exactness invariant (the correctness oracle): because LSH candidacy
    is a per-pair property (shared (band, bucket)) and verification is
    per-pair exact Jaccard, incremental == batch restricted to pairs
    touching a new doc:

        batch(old ∪ new)  ==  batch(old)  ∪  incremental(new, store(old))

    Document ids must be unique across old and new (append-only corpus
    ids; re-ingested ids belong in a CDC path, not here).

    Shuffles: signature groupBy for the new docs, one (band, bucket)
    join of new bands against (store ∪ new) bands, two shingle-
    rehydration joins for the sparse candidate set. Store-side cost
    scales with bucket collisions against new docs only.
    """
    tag = F.lit(batch_id).alias("ingest_batch")
    sh_new = _shingle_arrays(new_docs, text_col, id_col, shingle_n)
    sigs_new = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_n, shingle_df=sh_new
    )
    bands_new = lsh_buckets(sigs_new, id_col, num_hashes, num_bands).select("*", tag)
    sigs_new = sigs_new.select("*", tag)
    sh_new = sh_new.select("*", tag)

    all_bands = store.bands.unionByName(bands_new)
    if bucket_cap is not None:
        # Cap on the COMBINED table: a bucket's heat is a property of
        # the whole corpus, not of the new batch alone (same semantics
        # as the batch path; see cap_hot_buckets). The probe side is
        # capped by the same rule so both halves of a hot bucket drop.
        all_bands = cap_hot_buckets(all_bands, bucket_cap)
        bands_probe = all_bands.join(
            bands_new.select(id_col).distinct(), id_col, "left_semi"
        )
    else:
        bands_probe = bands_new
    nb = bands_probe.select(F.col(id_col).alias("_nid"), "band", "bucket")
    ab = all_bands.select(F.col(id_col).alias("_oid"), "band", "bucket")
    # New side probes the combined band table: (new x old) pairs appear
    # once, (new x new) pairs twice (once from each probe) — normalized
    # ordering + dropDuplicates collapses them, matching the batch
    # path's a.id < b.id convention.
    cand = (
        nb.join(ab, ["band", "bucket"])
        .where(F.col("_nid") != F.col("_oid"))
        .select(
            F.least("_nid", "_oid").alias("id_a"),
            F.greatest("_nid", "_oid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_all = store.shingles.unionByName(sh_new)
    a = sh_all.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh_all.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("sh_b"))
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    updated = MinhashStore(
        sigs=store.sigs.unionByName(sigs_new),
        bands=store.bands.unionByName(bands_new),
        shingles=store.shingles.unionByName(sh_new),
    )
    return pairs, updated


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash selection).

    The classic local-fingerprinting scheme (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting"):
    hash every word ``k``-gram, slide a window of ``w`` consecutive
    hashes over the sequence, keep the minimum hash of each window, and
    emit the distinct minima as the document's fingerprint set. Any
    shared substring longer than ``w + k - 1`` words between two
    documents is guaranteed to share a fingerprint.

    Spark shape: repartition by id (parallel gram computation AND the
    very partitioning the window needs — no second exchange), posexplode
    grams, md5 per gram (portable to the DuckDB oracle), partitioned
    ``min().over(rowsBetween(0, w-1))``, full windows only (a doc with
    fewer than ``w`` grams contributes its single whole-doc minimum).
    Per-document window partitions are bounded by document length, so
    this scales horizontally at 100 TB — no global window anywhere.
    """
    from pyspark.sql.window import Window

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # The gram-array table is checkpointed BEFORE the posexplode:
    # without it, InferFiltersFromGenerate pushes a size()/isnotnull
    # filter containing the full tokenize+shingle HOF below the
    # repartition, re-running the tokenizer over the raw single-split
    # scan on one core (the round-8 Generate pathology; found here by
    # the round-9 full-registry bench — 16.3 s -> 1.9 s at sf0.1).
    arr = (
        df.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), k).alias("_grams"))
        .localCheckpoint(eager=False)
    )
    grams = arr.select(
        F.col(id_col),
        F.size("_grams").alias("_m"),
        F.posexplode("_grams").alias("_pos", "_g"),
    )
    hashed = grams.select(id_col, "_m", "_pos", F.md5(F.col("_g")).alias("_h"))
    win = Window.partitionBy(id_col).orderBy("_pos").rowsBetween(Window.currentRow, w - 1)
    return (
        hashed.withColumn("fingerprint", F.min("_h").over(win))
        .where(F.col("_pos") <= F.greatest(F.col("_m") - w, F.lit(0)))
        .select(id_col, "fingerprint")
        .distinct()
    )


def exact_repeated_substrings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
) -> DataFrame:
    """CORPUS-level exact-substring dedup (the sorted-suffix method of
    Lee et al. ACL'22, ExactSubstr): every maximal token span of
    >= ``min_len`` tokens that occurs >= 2 times ANYWHERE in the
    corpus (cross-doc or within one doc), reported per document as
    (doc_id, span_start, span_tokens, n_windows, min_occ).

    The published implementation builds one suffix array over the
    concatenated corpus; the distributed equivalent rests on the same
    identity that replaces it with sort/groupBy primitives: a span of
    length >= L repeats iff EVERY length-L window inside it repeats,
    so (1) emit every length-L token shingle with its position —
    these are the length-L prefixes of all suffixes, i.e. exactly
    what adjacent entries of the sorted suffix array would compare;
    (2) count occurrences per shingle (the sort/groupBy standing in
    for suffix ordering); (3) keep positions whose window count >= 2;
    (4) merge consecutive repeated positions per doc (gaps-and-
    islands) into maximal repeated spans.

    Distinct from :func:`duplicated_spans`, which is per-PAIR (gram
    equi-join, cost ~ matched-gram pairs): this is per-CORPUS — no
    pair join anywhere, so a boilerplate gram that appears k times
    costs k counter updates here versus k^2/2 join rows there. Both
    shuffles are bounded by the input row count (one on gram for the
    occurrence count, one on doc for the island merge over only the
    REPEATED sliver), which is why this feed needs no count-cap: the
    pair-feed flood mode structurally cannot happen.

    Positions are 1-based (DuckDB's generate_subscripts convention);
    ``min_occ`` is the corpus occurrence count of the span's rarest
    window — 2 means the span is duplicated exactly once somewhere.
    """
    from pyspark.sql.window import Window

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # checkpoint the gram arrays BEFORE posexplode: the round-8
    # InferFiltersFromGenerate pathology re-runs the tokenizer over the
    # raw single-split scan otherwise (see _posting_shingles)
    arr = (
        docs.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), min_len).alias("_g"))
        .localCheckpoint(eager=False)
    )
    pos = arr.select(
        F.col(id_col), F.posexplode("_g").alias("_p0", "_gram")
    ).select(id_col, (F.col("_p0") + 1).cast("long").alias("pos"), "_gram")
    # occurrence counts via groupBy + join-back, NOT count-over-window:
    # a window has no map-side partial aggregation and AQE does not
    # split window partitions, so one boilerplate gram repeated 10^8
    # times (license headers — exactly this operator's target corpus)
    # would land every position on a single task. The groupBy's
    # map-side combine collapses the hot gram to one row per map task,
    # and the join-back is an ordinary shuffle join AQE skew-splits
    # (r11 verdict #3; adversarial fixture in tests/test_round12_ops).
    occ = (
        pos.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= 2)
    )
    rep = pos.join(occ, "_gram").select(id_col, "pos", "occ")
    w_isl = Window.partitionBy(id_col).orderBy("pos")
    return (
        rep.withColumn("_grp", F.col("pos") - F.row_number().over(w_isl))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(min_len - 1)).cast("long").alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.min("occ").cast("long").alias("min_occ"),
        )
        .drop("_grp")
    )


def exact_substr_gram_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
) -> DataFrame:
    """(gram, n) occurrence counts of length-``min_len`` token shingles
    — the WHOLE persisted state of incremental exact-substring dedup.
    Counts are mergeable by sum, so the production layout is a parquet
    table partitioned by ingest_batch (append-only, the MinhashStore
    lesson): a daily run writes only its own batch's counts and reads
    the union with a groupBy-sum. No positions, no text — the state
    is vocabulary-of-grams sized, far below corpus size."""
    arr = (
        docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), min_len).alias("_g"))
        .localCheckpoint(eager=False)
    )
    return (
        arr.select(F.explode("_g").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def incremental_repeated_substrings(
    new_docs: DataFrame,
    stored_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Incremental ExactSubstr: repeated spans in the NEW batch against
    (new batch ∪ already-ingested corpus), tokenizing ONLY the new
    batch. Returns ``(spans, new_counts)`` — spans has the same
    schema as :func:`exact_repeated_substrings`; append ``new_counts``
    to the store afterwards.

    The trust identity (the incremental_near_dups argument): a new
    window's corpus occurrence count is exactly
    ``n_new(gram) + n_stored(gram)`` because corpus = old ∪ new — so
    incremental(new, store(old)) equals the full-corpus batch result
    restricted to new docs, which is how the oracle checks it."""
    from pyspark.sql.window import Window

    arr = (
        new_docs.repartition(
            new_docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(F.col(id_col), shingles_of(F.col("_toks"), min_len).alias("_g"))
        .localCheckpoint(eager=False)
    )
    pos = arr.select(
        F.col(id_col), F.posexplode("_g").alias("_p0", "gram")
    ).select(id_col, (F.col("_p0") + 1).cast("long").alias("pos"), "gram")
    new_counts = (
        pos.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = new_counts.join(
        stored_counts.withColumnRenamed("n", "_n_old"), "gram", "left"
    ).select(
        "gram",
        (F.col("n") + F.coalesce("_n_old", F.lit(0))).cast("long").alias("occ"),
    )
    rep = pos.join(tot, "gram").where(F.col("occ") >= 2).select(
        id_col, "pos", "occ"
    )
    w_isl = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        rep.withColumn("_grp", F.col("pos") - F.row_number().over(w_isl))
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(min_len - 1))
            .cast("long")
            .alias("span_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.min("occ").cast("long").alias("min_occ"),
        )
        .drop("_grp")
    )
    return spans, new_counts


def exact_repeated_substrings_excise(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
) -> DataFrame:
    """The APPLY half of :func:`exact_repeated_substrings` — ExactSubstr's
    dedup policy (Lee et al. ACL'22): the CORPUS-FIRST occurrence of
    every repeated substring survives, all later occurrences are
    excised. One row per document: (doc_id, n_tokens, n_removed,
    clean_text); clean_text NULL when every token was a later copy
    (drop the doc).

    Window classification uses the report's groupBy + join-back shape
    (NOT per-gram windows — see exact_repeated_substrings' hot-gram
    note): one per-gram aggregate computes occurrence count (repeated
    iff >= 2) AND the corpus-first occurrence as min(struct(doc_id,
    pos)) — the (doc_id, pos) key is unique, so min == row_number 1
    under the same ordering — with map-side combine collapsing even a
    10^8-occurrence boilerplate gram to one row per map task; the
    join-back is AQE skew-splittable. A token is removed iff it is
    covered by some NON-FIRST repeated window and by NO first repeated
    window — so the surviving copy keeps its tokens even where other
    repeats overlap it, a deterministic interval rule the oracle
    replays token-by-token. The excision itself is the zero-shuffle
    HOF-filter map of excise_duplicated_spans; only the repeated-
    window sliver (tiny relative to the corpus) shuffles."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    arr = (
        docs.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            "_toks",
            shingles_of(F.col("_toks"), min_len).alias("_g"),
        )
        .localCheckpoint(eager=False)
    )
    pos = arr.select(
        F.col(id_col), F.posexplode("_g").alias("_p0", "_gram")
    ).select(id_col, (F.col("_p0") + 1).cast("long").alias("pos"), "_gram")
    span = F.struct(
        F.col("pos").alias("s"),
        (F.col("pos") + min_len - 1).alias("e"),
    )
    # per-gram count + corpus-first occurrence in ONE map-side-combined
    # aggregate; (id, pos) is unique so min(struct) == rank-1 of the
    # (id_col, pos) ordering the spec calls for
    gstats = (
        pos.groupBy("_gram")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct(F.col(id_col).alias("_i"), F.col("pos").alias("_p"))).alias(
                "_first"
            ),
        )
        .where(F.col("occ") >= 2)
    )
    rep = pos.join(gstats, "_gram").withColumn(
        "_is_first",
        (F.col(id_col) == F.col("_first._i")) & (F.col("pos") == F.col("_first._p")),
    )
    iv = rep.groupBy(id_col).agg(
        F.collect_list(F.when(~F.col("_is_first"), span)).alias("_nf"),
        F.collect_list(F.when(F.col("_is_first"), span)).alias("_ff"),
    )
    joined = arr.join(iv, id_col, "left").select(
        F.col(id_col),
        "_toks",
        F.coalesce(F.col("_nf"), F.array()).alias("_nfn"),
        F.coalesce(F.col("_ff"), F.array()).alias("_ffn"),
    )
    covered = lambda col, i: F.exists(  # noqa: E731
        F.col(col), lambda v: (i + 1 >= v.s) & (i + 1 <= v.e)
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~(covered("_nfn", i) & ~covered("_ffn", i)),
    )
    return joined.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.when(F.size(kept) > 0, F.array_join(kept, " ")).alias("clean_text"),
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
) -> DataFrame:
    """60-bit SimHash per document as (id, simhash).

    Classic sign-aggregation: for each bit b, sum +/-1 over the token
    hashes; bit set iff the sum is positive. Shuffle-based formulation
    (explode tokens -> 60 flat +/-1 columns -> groupBy-sum -> recombine)
    for the same reason as :func:`minhash_signatures` — flat codegen'd
    expressions with map-side partial aggregation, instead of nested
    higher-order lambdas (interpreted, quadratic re-evaluation).

    60 bits (not 64): the token hash is ``md5_long(token, 15)`` — the
    top 60 bits of md5, portable to the DuckDB oracle — and staying
    below bit 63 keeps every ``1 << b`` positive in signed int64, so
    the recombined signature needs no sign-bit special case in either
    engine. Bit shifts unroll at plan-build time (``b`` is a Python
    int — ``shiftright`` does not accept a column shift count).
    """
    n_bits = 60
    sh = shingles(F.col(text_col), shingle_n) if shingle_n > 1 else F.split(F.col(text_col), r"[ \t\n\f\r]+")
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    tok = df.repartition(n_parts, F.col(id_col)).select(F.col(id_col), F.explode(sh).alias("_t"))
    hashed = tok.select(id_col, md5_long(F.col("_t"), 15).alias("_h"))
    bits = hashed.select(
        id_col,
        *[
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1).alias(f"s{b}")
            for b in range(n_bits)
        ],
    )
    sums = bits.groupBy(id_col).agg(*[F.sum(f"s{b}").alias(f"s{b}") for b in range(n_bits)])
    sig = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return sums.select(id_col, sig.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash signatures (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (AllPairs /
    SSJoin family — Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06):
    all pairs with shingle-Jaccard >= ``threshold``, with a candidate
    stage that provably misses nothing.

    The deterministic complement to MinHash-LSH: LSH trades recall for
    candidate sparsity (a pair can hash apart in every band); prefix
    filtering keeps EXACT recall and gets sparsity from a theorem —
    order each doc's shingles by a fixed global order (rarest-first by
    document frequency, ties on the shingle string) and keep only the
    first ``|x| - ceil(t*|x|) + 1``; any pair with J >= t must share a
    PREFIX shingle, so the candidate join runs over prefix postings
    only. Rarest-first makes those postings the shortest ones, so
    candidate volume tracks rare-shingle co-occurrence, not vocabulary
    hotspots. High thresholds shrink prefixes (t=0.9 keeps ~10%);
    as t -> 0 the prefix approaches the whole set and LSH becomes the
    better trade — which is why both paths exist here.

    On top of the prefix cut, two further zero-recall-cost candidate
    reductions from the ppjoin line of work (Xiao et al., WWW'08):

    - LENGTH filter: J(x,y) >= t forces min(|x|,|y|) >= t*max(|x|,|y|)
      (the intersection is at most the smaller set and at least
      t*union >= t*max), so size-mismatched postings pairs drop before
      the pair ever exists.
    - POSITIONAL filter: a shared token at global-order ranks
      (r_a, r_b) bounds the overlap by
      min(r_a, r_b) + min(|x|-r_a, |y|-r_b) (common tokens split into
      those <= t and those > t in the global order); J >= t needs
      overlap >= t/(1+t) * (|x|+|y|), so a candidate survives only if
      the TIGHTEST bound over its shared prefix tokens clears that
      floor. This specifically attacks dense vocabularies, where the
      plain prefix cut still generates heavy postings.

    Stages (all shuffle-keyed, nothing quadratic outside true
    candidates): shingle arrays (shared one-pass table) -> posting
    explode -> document-frequency agg -> per-doc rank window ->
    prefix cut -> posting self-join + length/positional filters ->
    per-pair tightest-bound aggregation -> exact Jaccard verify by
    array rehydration (same pattern as the LSH verify stage above).
    """
    sh = _shingle_arrays(df, text_col, id_col, shingle_n)
    cand = _prefix_candidates(sh, id_col, threshold)
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    jac = inter / union
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _prefix_candidates(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    length_filter: bool = True,
    positional_filter: bool = True,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs for :func:`prefix_filter_pairs`.

    Exposed with filter toggles so tests can measure the candidate-set
    reduction each ppjoin filter buys; production callers always run
    with both on (each is a theorem — recall is unchanged, only the
    candidate volume drops).
    """
    from pyspark.sql.window import Window

    toks = sh.select(F.col(id_col), F.explode("_sh").alias("_t"))
    dfreq = toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    w_rank = Window.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("_t"))
    w_sz = Window.partitionBy(id_col)
    ranked = (
        toks.join(dfreq, "_t")
        .withColumn("_r", F.row_number().over(w_rank))
        .withColumn("_sz", F.count(F.lit(1)).over(w_sz))
    )
    prefix = (
        ranked.where(
            F.col("_r") <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1
        )
        .select(F.col(id_col).alias("_id"), "_t", "_r", "_sz")
        # r13: BOTH sides of the self-join below read this frame, and
        # ReuseExchange cannot dedup the explode/df-agg/rank-window
        # chain above a LogicalRDD — without a checkpoint the whole
        # prefix build executes twice (visible as a duplicated
        # Generate->Join->Window subtree in the executed plan). Same
        # discipline as _shingle_arrays (the r8 self-join lesson).
        .localCheckpoint(eager=False)
    )

    a, b = prefix.alias("pa"), prefix.alias("pb")
    join_cond = (F.col("pa._t") == F.col("pb._t")) & (F.col("pa._id") < F.col("pb._id"))
    if length_filter:
        # pushed INTO the posting join so oversize-mismatch pairs never
        # materialize out of a hot posting
        join_cond = (
            join_cond
            & (F.col("pb._sz") >= F.lit(threshold) * F.col("pa._sz"))
            & (F.col("pa._sz") >= F.lit(threshold) * F.col("pb._sz"))
        )
    matched = a.join(b, join_cond).select(
        F.col("pa._id").alias("id_a"),
        F.col("pb._id").alias("id_b"),
        F.col("pa._r").alias("_ra"),
        F.col("pb._r").alias("_rb"),
        F.col("pa._sz").alias("_sza"),
        F.col("pb._sz").alias("_szb"),
    )
    if not positional_filter:
        return matched.select("id_a", "id_b").distinct()

    # overlap upper bound from this shared token's ranks; the pair's
    # tightest bound (min over its shared prefix tokens) must clear the
    # Jaccard overlap floor t/(1+t) * (|x|+|y|).
    ubound = F.least(F.col("_ra"), F.col("_rb")) + F.least(
        F.col("_sza") - F.col("_ra"), F.col("_szb") - F.col("_rb")
    )
    return (
        matched.select("id_a", "id_b", ubound.alias("_ub"), "_sza", "_szb")
        .groupBy("id_a", "id_b")
        .agg(
            F.min("_ub").alias("_ub"),
            F.first("_sza").alias("_sza"),
            F.first("_szb").alias("_szb"),
        )
        .where(
            F.col("_ub")
            >= F.lit(threshold / (1.0 + threshold)) * (F.col("_sza") + F.col("_szb"))
        )
        .select("id_a", "id_b")
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 8,
    min_run: int = 3,
) -> DataFrame:
    """EXACT shared-span extents per document pair (Lee et al. ACL'22):
    (id_a, id_b, n_gram_matches, max_run_grams, max_span_tokens).

    Two documents share a verbatim token run of length ``gram + r - 1``
    iff ``r`` consecutive ``gram``-grams match at a constant position
    offset — so the longest shared span is a gaps-and-islands pass over
    the gram equi-join, grouped per (pair, diagonal). No suffix array,
    no quadratic scan: non-duplicated content never survives the gram
    join, and the diagonal window plus both collapse aggregations all
    cluster on prefixes of (id_a, id_b, diag), so the post-join
    pipeline rides one exchange. Worst-case fan-out is boilerplate
    grams; prune those upstream (text_boilerplate_ngram_prune) or cap
    posting df before the join at corpus scale.
    """
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.operators.textops import shingles_of, tokens

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    grams = (
        docs.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks"))
        .select("_id", shingles_of(F.col("_toks"), gram).alias("_g"))
        .localCheckpoint(eager=False)
    )
    pos = grams.select("_id", F.posexplode("_g").alias("pos", "gram"))
    a, b = pos.alias("a"), pos.alias("b")
    m = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram")) & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = m.select(
        "id_a", "id_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
    ).withColumn("grp", F.col("pa") - F.row_number().over(w))
    rl = runs.groupBy("id_a", "id_b", "diag", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        rl.groupBy("id_a", "id_b")
        .agg(
            F.sum("run_len").alias("n_gram_matches"),
            F.max("run_len").alias("max_run_grams"),
            (F.max("run_len") + F.lit(gram - 1)).alias("max_span_tokens"),
        )
        .where(F.col("max_run_grams") >= min_run)
    )


def excise_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 8,
    min_run: int = 3,
) -> DataFrame:
    """Apply the span-dedup POLICY (Lee et al. ACL'22): first occurrence
    wins — every maximal shared run of >= ``gram + min_run - 1`` tokens
    is removed from the HIGHER-id document of each pair; the lower-id
    copy stays intact. Returns one row per document: (doc_id, n_tokens,
    n_removed, clean_text) with whitespace normalized to single spaces.

    Pipeline: the same gram-join + diagonal-islands pass as
    :func:`duplicated_spans` but keeping EVERY qualifying run (not the
    per-pair max), converted to token intervals on the b side, merged
    per document (second gaps-and-islands: running-max-end over starts
    — overlapping excisions from different partners collapse), then
    excised with an index-aware HOF filter against the per-doc interval
    array — the excision itself is a zero-shuffle map over the corpus;
    only the interval table (duplicated mass, tiny relative to the
    corpus) ever shuffles. Interval positions are engine-local (0- or
    1-based) but used only against the same engine's token positions,
    so the removed token SET is representation-independent.
    """
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.operators.textops import shingles_of, tokens

    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.repartition(n_parts, F.col(id_col))
        .select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks"))
        .localCheckpoint(eager=False)
    )
    pos = base.select(
        "_id", F.posexplode(shingles_of(F.col("_toks"), gram)).alias("pos", "gram")
    )
    a, b = pos.alias("a"), pos.alias("b")
    m = a.join(
        b,
        (F.col("a.gram") == F.col("b.gram")) & (F.col("a._id") < F.col("b._id")),
    ).select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        m.select("id_a", "id_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
        .withColumn("grp", F.col("pa") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"), F.min("pb").alias("b_start"))
        .where(F.col("run_len") >= min_run)
    )
    # token intervals to excise on the b side; merge overlaps per doc
    iv = runs.select(
        F.col("id_b").alias("_id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("run_len") + F.lit(gram - 2)).alias("e"),
    ).distinct()
    w_iv = Window.partitionBy("_id").orderBy("s", "e")
    merged = (
        iv.withColumn(
            "_pmax",
            F.max("e").over(w_iv.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "_isl",
            F.sum(
                F.when(F.col("_pmax").isNull() | (F.col("s") > F.col("_pmax")), 1).otherwise(0)
            ).over(w_iv.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("_id", "_isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_iv"))
    )
    joined = base.join(merged, "_id", "left").select(
        "_id",
        "_toks",
        # project the null-coalesced interval array to a plain ATTRIBUTE
        # before the HOF references it (lambdas re-evaluate their
        # operand expression per element — operators/dedup.py header)
        F.coalesce(F.col("_iv"), F.array()).alias("_ivn"),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda x, i: ~F.exists(F.col("_ivn"), lambda v: (i >= v.s) & (i <= v.e)),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.size("_toks").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


# --------------------------------------------------------------------------
# Shared exact shingle-posting pair feed (+ hot-shingle DF cap)
# --------------------------------------------------------------------------

def _posting_shingles(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    block_col: str | None,
) -> DataFrame:
    """(id, [block], _sh) distinct-shingle arrays, repartitioned by id
    and CHECKPOINTED. The checkpoint is not just reuse: Catalyst's
    infer-filters-from-Generate otherwise pushes a size()/isnotnull
    filter containing the FULL shingle HOF expression below the
    repartition, re-running the tokenizer over the raw (single-split)
    parquet scan on one core — measured 18 s vs ~1 s at sf0.1 on the
    spill query before this was shared."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    return (
        docs.repartition(n_parts, F.col(id_col))
        .select(*cols, tokens(F.col(text_col)).alias("_toks"))
        .select(
            *cols,
            F.array_distinct(shingles_of(F.col("_toks"), shingle_n)).alias("_sh"),
        )
        .localCheckpoint(eager=False)
    )


def shingle_posting_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    block_col: str | None = None,
    shingle_df_cap: int | None = None,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """THE exact near-dup pair feed: ``(id_a, id_b, inter, size_a,
    size_b)`` for every document pair sharing >= 1 shingle, via a
    shingle POSTING join (never docs² per block — a pair sharing zero
    shingles has similarity 0 under any t > 0 and never materializes,
    so cost scales with matched posting volume; SCALE.md r6 measured
    the n² form at 6.7x growth where this one is sub-linear).

    One implementation feeds dedup_ngram_jaccard_pairs,
    dedup_containment_pairs, split_leakage_audit, source_overlap_matrix
    and the CC cluster family (queries/text.py) — previously four
    inline copies, one drift site per copy (VERDICT r7 task #7).

    ``block_col``: optional blocking key (e.g. ``lang``) ANDed into the
    posting join — pairs never form across blocks.

    ``shingle_df_cap`` — the skew guard (VERDICT r7 "What's wrong" #1).
    A shingle appearing in *f* docs contributes C(f, 2) join rows on
    ONE shuffle key; a boilerplate-heavy crawl (license headers,
    templated pages) puts f in the millions and turns the "sparse"
    posting join quadratic on a single partition. With a cap, postings
    whose per-(block, shingle) document frequency exceeds it are
    dropped BEFORE the self-join — the ``cap_hot_buckets`` discipline
    (operators/dedup.py:180) applied to the exact path. The DF count is
    a window over the same (block, shingle) partitioning the join
    shuffles on, so the cap adds no exchange of its own.

    Capped semantics (documented, not hidden): ``inter`` then counts
    only sub-cap shingles while ``size_a``/``size_b`` stay full set
    sizes, so capped Jaccard/containment are UNDER-estimates and a pair
    whose overlap is exclusively boilerplate disappears — exactly the
    degenerate cluster the cap exists to absorb (collapse verbatim
    copies upstream with :func:`exact_dedup`, prune boilerplate with
    text_boilerplate_ngram_prune). Audit what a cap spills with
    :func:`hot_shingle_spill` before choosing one; default ``None``
    keeps the feed exact.

    ``shingle_df``: pre-built ``(id_col, [block_col], _sh)`` distinct-
    shingle-array table (e.g. a checkpointed :func:`_shingle_arrays`)
    so a caller sharing the tokenizer pass with MinHash signatures
    tokenizes once.
    """
    from pyspark.sql.window import Window

    sh = (
        shingle_df
        if shingle_df is not None
        else _posting_shingles(docs, text_col, id_col, shingle_n, block_col)
    )
    sizes = sh.select(F.col(id_col), F.size("_sh").alias("_sz"))
    post_cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    post = sh.select(*post_cols, F.explode("_sh").alias("_g"))
    if shingle_df_cap is not None:
        w = Window.partitionBy(*(([block_col] if block_col else []) + ["_g"]))
        post = (
            post.withColumn("_df", F.count(F.lit(1)).over(w))
            .where(F.col("_df") <= shingle_df_cap)
            .drop("_df")
        )
    a, b = post.alias("a"), post.alias("b")
    cond = (F.col("a._g") == F.col("b._g")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # NO broadcast hint: `sizes` is corpus-sized (one row per doc) —
    # forcing it driver-side is the 100 TB anti-pattern. AQE broadcasts
    # it at test scale and falls back to a shuffle join beyond the
    # threshold.
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("size_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def hot_shingle_spill(
    docs: DataFrame,
    shingle_df_cap: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    block_col: str | None = None,
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """The spill metric for :func:`shingle_posting_pairs`'s cap — one
    row per (block, shingle) a cap of ``shingle_df_cap`` would drop:
    its document frequency and the C(df, 2) posting-join comparisons it
    would otherwise have generated (the observability half of the cap;
    a silent cap would read as full coverage — ``lsh_hot_buckets``
    discipline)."""
    sh = (
        shingle_df
        if shingle_df is not None
        else _posting_shingles(docs, text_col, id_col, shingle_n, block_col)
    )
    post_cols = ([F.col(block_col)] if block_col else []) + [
        F.explode("_sh").alias("shingle")
    ]
    keys = ([block_col] if block_col else []) + ["shingle"]
    return (
        sh.select(*post_cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > shingle_df_cap)
        .withColumn(
            # integer `div`, not `/`: Spark's `/` promotes to double and
            # loses exactness past 2^53 (df >~ 9.5e7 — plausible for the
            # boilerplate-skew corpora this audit targets), drifting from
            # the oracle's exact integer floor division (ADVICE r8 #1)
            "skipped_comparisons",
            F.expr("df * (df - 1) div 2"),
        )
    )
