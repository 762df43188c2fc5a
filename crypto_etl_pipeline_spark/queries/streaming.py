"""Streaming + multimodal queries for the driver registry (§2.10/§2.13).

Streaming queries run a REAL Structured Streaming job (file source ->
watermark/state -> memory sink, Trigger.AvailableNow) and return the
drained sink as a batch DataFrame, so the driver's oracle comparison
exercises the streaming engine end-to-end:

- APPEND-mode windowed aggregation (watermark-closed emission, state
  swept empty; sentinel-forced under the bounded drain) == the batch
  GROUP BY (oracle).
- Watermarked dedup over a doubled source == DISTINCT (oracle).
- applyInPandasWithState sessionization == a SQL gaps-and-islands
  query EXCLUDING each user's last session (append mode only emits
  sessions closed by a later event; the final open session stays in
  state when the AvailableNow drain stops).

Multimodal queries push payloads through the Arrow mapInPandas stubs;
the fake codec's arithmetic is mirrored in SQL so the plumbing (batch
iteration, schemas, 1->N fan-out) is value-checked, not just run.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table

SESSION_GAP_SECONDS = 6 * 3600  # ~median per-user gap is 7h at sf0.01


def _tmpdir(prefix: str) -> str:
    """mkdtemp + interpreter-exit cleanup. Every scratch dir a streaming
    query creates (stage symlinks, checkpoints, sketch/MG snapshot
    stores) goes through here so repeated bench/driver runs don't
    accumulate orphaned state under /tmp — the MG store in particular
    persists parquet snapshot data per run, not just metadata."""
    import atexit
    import shutil

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _stage_dir(sf_dir: str, copies: int) -> str:
    """Stage the events parquet into a fresh stream-input dir via
    symlinks (read-only source is never touched)."""
    d = _tmpdir("events_stream_")
    src = os.path.join(sf_dir, "events.parquet")
    for i in range(copies):
        os.symlink(src, os.path.join(d, f"events_{i}.parquet"))
    return d


def _checkpoint() -> str:
    return _tmpdir("ckpt_")


def _footer_max_ts(path: str, ts_kind: str):
    """Max event time from parquet FOOTER statistics — no data scan
    (the sentinel only needs 'beyond max + watermark', so the footer's
    us-truncated max is plenty). Returns None if stats are absent or
    the path is a multi-file dataset; caller falls back to a scan."""
    import datetime

    import pyarrow.parquet as pq

    try:
        pf = pq.ParquetFile(path)
        i = pf.schema_arrow.get_field_index("ts")
        mx = None
        for rg in range(pf.num_row_groups):
            st = pf.metadata.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                return None
            mx = st.max if mx is None else max(mx, st.max)
        if mx is None:
            return None
        if ts_kind == "bigint" and isinstance(mx, datetime.datetime):
            epoch = datetime.datetime(1970, 1, 1, tzinfo=mx.tzinfo)
            return int((mx - epoch).total_seconds()) * 1_000_000_000 + mx.microsecond * 1_000
        return mx
    except Exception:  # pragma: no cover - any footer oddity -> scan path
        return None


def _write_watermark_sentinels(
    spark, sf_dir: str, stage_dir: str, n: int = 2, user_id: int = -1
) -> None:
    """Write ``n`` single-row far-future sentinel parquet files into a
    staged stream-input dir (mtime-ordered AFTER the staged data files).

    Purpose: APPEND-mode windowed aggregation only emits a window once
    the watermark passes its end, and the watermark advances BETWEEN
    micro-batches — so a drain whose data all lands before the final
    batch would finish with every window still in state and an empty
    sink. Two sentinels guarantee full emission without relying on
    no-data-batch semantics: with maxFilesPerTrigger=1, the batch
    processing sentinel #2 runs with the watermark already advanced
    past sentinel #1 (far beyond every real window), flushing and
    DROPPING all real window state. Sentinel rows themselves never
    reach the aggregation when the query joins/filters them out (e.g.
    user_id=-1 misses every dimension key); they only advance the
    event-time stats at the withWatermark node, which must therefore
    sit UPSTREAM of the join.

    The sentinel file matches whichever physical ts encoding the staged
    events carry (ns-long / TIMESTAMP_NTZ / TIMESTAMP — see
    read_event_stream's probe).
    """
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src)
    ts_kind = dict(batch.dtypes)["ts"]
    max_ts = _footer_max_ts(src, ts_kind)
    if max_ts is None:  # pragma: no cover - stats-less parquet fallback
        max_ts = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]

    if ts_kind == "bigint":  # TIMESTAMP(NANOS) surfaced as ns-long
        ts_type = pa.int64()
        mk = lambda days: int(max_ts) + days * 86_400 * 1_000_000_000  # noqa: E731
    else:
        import datetime

        ts_type = (
            pa.timestamp("us")
            if ts_kind == "timestamp_ntz"
            else pa.timestamp("us", tz="UTC")
        )
        mk = lambda days: max_ts + datetime.timedelta(days=days)  # noqa: E731

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", ts_type),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    now = time.time()
    for i in range(n):
        tbl = pa.table(
            {
                "event_id": [-(i + 1)],
                "ts": [mk(365 * (i + 1))],
                "user_id": [user_id],
                "event_type": ["_sentinel"],
                "value": [0.0],
                "props": [None],
            },
            schema=schema,
        )
        p = os.path.join(stage_dir, f"zz_sentinel_{i}.parquet")
        pq.write_table(tbl, p)
        os.utime(p, (now + i + 1, now + i + 1))


@register(
    "stream_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Structured Streaming watermarked 1h tumbling rollup, append-mode watermark-closed emission, availableNow drain",
    tags=("streaming",),
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.streaming.incremental import (
        hourly_rollup_stream,
        read_event_stream,
        run_available_now,
    )

    # APPEND mode (round 5): each window emits exactly once when the
    # watermark passes it, then its state drops — on a continuous
    # stream, state is bounded by the watermark horizon, where
    # 'complete' mode's grows with every window ever seen. Two
    # far-future sentinel files force full emission under the
    # AvailableNow drain (watermark advances past every real window in
    # micro-batch 1; batch 2 triggers their emission); the sentinels
    # are excluded DOWNSTREAM of the watermark node so they advance
    # event time without ever creating window state.
    stage = _stage_dir(sf_dir, copies=1)
    _write_watermark_sentinels(spark, sf_dir, stage, n=2)
    # r14: all three files (events + both sentinels) in ONE data batch
    # — the watermark still advances past every real window at that
    # batch's end, and the standard no-data batch emits every closed
    # window, so the drain is 2 micro-batch cycles instead of 3 at
    # identical sink contents (the interval-join family fix; ~0.7-1 s
    # of fixed per-cycle overhead measured).
    events = read_event_stream(spark, stage)
    rolled = hourly_rollup_stream(
        events, watermark="2 hours", exclude_event_types=("_sentinel",)
    )
    return run_available_now(
        rolled,
        f"rollup_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=8,  # ~3.4k window keys; sized to state, not batch shuffle
    )


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, user_id,
           event_type, round(value, 6) AS value
    FROM events
    """,
    description="dropDuplicatesWithinWatermark over a doubled stream == DISTINCT",
    tags=("streaming", "dedup"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        dedup_stream_within_watermark,
        read_event_stream,
        run_available_now,
    )

    # Two symlinked copies -> every event arrives twice; the watermark
    # horizon (45 days > the 30-day span) keeps all key-state alive.
    events = read_event_stream(spark, _stage_dir(sf_dir, copies=2))
    deduped = dedup_stream_within_watermark(events, watermark="45 days")
    out = run_available_now(
        deduped,
        f"dedup_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=8,  # ~10k event_id keys at the gate SF
        # r14: dropDuplicatesWithinWatermark emits each first
        # occurrence eagerly in the batch that reads it — the trailing
        # no-data batch only evicts state and appends nothing (the
        # stream_interval_join precedent), so skip its ~0.7 s cycle.
        extra_confs={"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    )
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
    )


# Shared by the v1 (applyInPandasWithState) and v2 (transformWithState)
# sessionizers: both fold the same _fold_sessions kernel, so one
# gaps-and-islands SQL pins both.
_GAP_SESSIONS_ORACLE = f"""
    WITH marked AS (
      SELECT user_id, ts, coalesce(value, 0.0) AS v,
             CASE WHEN epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                       > {SESSION_GAP_SECONDS} OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    numbered AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    sessions AS (
      SELECT user_id, session_no,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
             count(*) AS n_events,
             round(sum(v), 4) AS sum_value,
             max(session_no) OVER (PARTITION BY user_id) AS last_no
      FROM numbered
      GROUP BY user_id, session_no
    )
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM sessions WHERE session_no < last_no
    """


@register(
    "stream_sessionize_stateful",
    oracle=_GAP_SESSIONS_ORACLE,
    description="applyInPandasWithState gap sessionization == SQL gaps-and-islands (minus each user's open last session)",
    tags=("streaming", "stateful"),
)
def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_available_now,
        sessionize_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    sessions = sessionize_stream(events, gap_seconds=SESSION_GAP_SECONDS)
    out = run_available_now(
        sessions,
        f"sess_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=8,  # ~1k user keys
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def stream_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME sessionization contract as stream_sessionize_stateful,
    re-expressed on Spark 4's transformWithState v2 API: named typed
    state variables on a StatefulProcessor, RocksDB state store
    (mandated by the operator — scoped via extra_confs), timeMode
    'none' for the replay-deterministic oracle mode. Both APIs share
    one _fold_sessions kernel, so the v1 query's gaps-and-islands
    oracle pins this one too.

    Registered CONDITIONALLY (see _tws_runtime_available below):
    Spark's TWS Python runner hard-requires the protobuf>=5.27 runtime
    (its state-server protocol — StateMessage_pb2 imports
    google.protobuf.runtime_version), which this container does not
    ship and the environment contract forbids installing. The
    registered surface must stay runnable everywhere, so the query
    joins the registry only when the probe passes — the day the
    environment gains the dependency, the v2 state API enters the
    driver gate with the SAME gaps-and-islands oracle as v1. Until
    then the path is exercised by tests/test_round5_ops.py, which
    SKIPS without protobuf and asserts v1==v2==oracle where available
    (the PIL-codec precedent, multimodal/binary.py)."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        TWS_CONFS,
        read_event_stream,
        run_available_now,
        sessionize_stream_tws,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    sessions = sessionize_stream_tws(events, gap_seconds=SESSION_GAP_SECONDS)
    out = run_available_now(
        sessions,
        f"tws_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=8,  # ~1k user keys, matches the v1 operating point
        extra_confs=TWS_CONFS,
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def _tws_runtime_available() -> bool:
    """True iff Spark's transformWithState Python runner can start:
    its StateMessage protocol needs google.protobuf.runtime_version
    (protobuf >= 5.27). Probed at import so the registry only carries
    the query where the driver gate can actually run it."""
    try:
        from google.protobuf import runtime_version  # noqa: F401

        return True
    except Exception:
        return False


if _tws_runtime_available():  # pragma: no cover - absent in this container
    register(
        "stream_sessionize_tws",
        oracle=_GAP_SESSIONS_ORACLE,
        description="transformWithState (v2 state API) gap sessionization == SQL gaps-and-islands",
        tags=("streaming", "stateful"),
    )(stream_sessionize_tws)


@register(
    "multimodal_decode_mapinpandas",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) % 640 + 1 AS width,
           octet_length(encode(text)) % 480 + 1 AS height,
           octet_length(encode(text))           AS n_bytes
    FROM documents
    """,
    description="Arrow mapInPandas decode stub over binary payloads (value-checked plumbing)",
    tags=("multimodal",),
)
def multimodal_decode_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_fake_payloads,
        decode_image_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_payloads(docs)
    return decode_image_stub(media).drop("checksum")


@register(
    "multimodal_real_decode_ppm",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             octet_length(encode(text)) % 13 + 1 AS w,
             octet_length(encode(text)) % 7 + 1  AS h
      FROM documents
    )
    SELECT doc_id,
           w AS width,
           h AS height,
           (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
              + w * h * 3)::BIGINT AS n_bytes
    FROM dims
    """,
    description="REAL image decode: valid PPM(P6) payloads built per doc, parsed by the pure-Python codec via mapInPandas — header dims + exact byte count oracled",
    tags=("multimodal",),
)
def multimodal_real_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real-codec twin of multimodal_decode_mapinpandas (round-4
    VERDICT #5: the real decode path must execute, not sit flag-gated
    behind an absent library). Each document becomes a VALID binary
    PPM: header 'P6\\n{w} {h}\\n255\\n' + a raster of exactly w*h*3
    bytes drawn from the text (rpad-extended) — built with pure JVM
    expressions. The Arrow mapInPandas stage then runs the REAL
    magic-byte codec (multimodal/binary._real_decode -> _ppm_decode):
    the returned dimensions come from parsing the header out of the
    payload bytes, and the oracle recomputes them independently from
    the text length plus the exact header-size arithmetic
    (9 fixed bytes 'P6\\n',' ','\\n','255\\n' + digit counts of w,h).
    A stubbed decoder cannot pass this oracle — the stub's
    length-derived dims diverge from the header dims for every doc."""
    from crypto_etl_pipeline_spark.multimodal.binary import decode_image

    docs = load_table(spark, sf_dir, "documents")
    return decode_image(_ppm_media(docs), codec="real").drop("checksum").select(
        "doc_id", "width", "height", "n_bytes"
    )


def _ppm_media(docs: DataFrame) -> DataFrame:
    """VALID binary PPM(P6) per document, built with pure JVM
    expressions (the header is all-ASCII so UTF-8 encode is
    byte-exact): 'P6\\n{w} {h}\\n255\\n' + raster of exactly w*h*3
    bytes drawn from the text, rpad-extended with 'x'. Dims derive from
    byte length (w = n%13+1, h = n%7+1) so every oracle recomputes them
    from the table. Shared by the real-decode and phash queries."""
    sized = docs.select(
        "doc_id",
        "text",
        (F.octet_length(F.col("text")) % 13 + 1).alias("w"),
        (F.octet_length(F.col("text")) % 7 + 1).alias("h"),
    )
    return sized.select(
        "doc_id",
        F.encode(
            F.concat(
                F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h")),
                F.expr("rpad(substring(text, 1, w*h*3), w*h*3, 'x')"),
            ),
            "UTF-8",
        ).alias("payload"),
    )


#: shared oracle CTE chain producing ph(doc_id, w, h, phash) — the SQL
#: replay of _phash_frame (real pixel decode -> integer aHash)
_PHASH_SQL = """
    dims AS (
      SELECT doc_id, text,
             octet_length(encode(text)) % 13 + 1 AS w,
             octet_length(encode(text)) % 7 + 1  AS h
      FROM documents
    ),
    pad AS (
      SELECT doc_id, w, h,
             text || repeat('x', greatest(w*h*3 - length(text), 0)) AS t
      FROM dims
    ),
    px AS (
      SELECT p.doc_id, p.w, p.h, g.i AS pix,
             ord(substr(p.t, 3*g.i + 1, 1)) + ord(substr(p.t, 3*g.i + 2, 1))
               + ord(substr(p.t, 3*g.i + 3, 1)) AS gray
      FROM pad p, LATERAL unnest(generate_series(0, p.w*p.h - 1)) AS g(i)
    ),
    bits AS (
      SELECT doc_id, w, h, pix,
             CASE WHEN gray * (w*h) > sum(gray) OVER (PARTITION BY doc_id)
                  THEN '1' ELSE '0' END AS b
      FROM px
    ),
    ph AS MATERIALIZED (
      SELECT doc_id, w, h, string_agg(b, '' ORDER BY pix) AS phash
      FROM bits GROUP BY doc_id, w, h
    )
"""


@register(
    "multimodal_image_phash_dedup",
    oracle=f"""
    WITH {_PHASH_SQL}
    SELECT doc_id, w::INT AS width, h::INT AS height, phash,
           (count(*) OVER (PARTITION BY w, h, phash) - 1)::BIGINT AS n_dup_peers
    FROM ph
    """,
    description="Image near-dup building block: average-hash (aHash) over REAL decoded PPM pixels, assembled engine-side, exact perceptual-dup peers counted per hash",
    tags=("multimodal", "dedup"),
)
def multimodal_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing joins the dedup surface: the Arrow
    kernel (multimodal/binary.pixel_gray_rows) runs the REAL PPM codec
    and fans out one (pix, gray=r+g+b) row per pixel; everything after
    is engine work — the aHash threshold is a doc-keyed window
    (gray * n_pixels > total_gray, integer-exact: no mean division to
    round), the hash assembles via array_sort(collect_list) so bit
    order is layout-independent, and dup peers come from a
    (width, height, phash) window count, NO self-join. On a real image
    corpus the payloads would be camera files and this exact plan finds
    re-encodes/brightness-shifted copies that byte-level md5 misses.

    Scale shape: pixel fan-out is bytes-proportional; the two window
    passes key on doc_id and on the hash value (bounded groups); at
    100 TB banding the phash prefix into the established simhash
    cap+spill machinery is one groupBy away."""
    from pyspark.sql.window import Window

    ph = _phash_frame(spark, sf_dir)
    return ph.withColumn(
        "n_dup_peers",
        F.count(F.lit(1)).over(Window.partitionBy("width", "height", "phash"))
        - F.lit(1),
    )


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, phash) over REAL decoded pixels — the
    shared feed of the phash dedup/pair queries; see
    multimodal_image_phash_dedup's docstring for the contract."""
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.multimodal.binary import pixel_gray_rows

    docs = load_table(spark, sf_dir, "documents")
    px = pixel_gray_rows(_ppm_media(docs))
    bits = px.withColumn(
        "b",
        F.when(
            F.col("gray") * (F.col("width") * F.col("height"))
            > F.sum("gray").over(Window.partitionBy("doc_id")),
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return bits.groupBy("doc_id", "width", "height").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pix", "b"))),
                lambda s: s.getField("b"),
            ),
            "",
        ).alias("phash")
    )


PHASH_BANDS = 4  #: hamming<=3 pigeonhole: one of 4 bands must match exactly
PHASH_BUCKET_CAP = 16  #: max docs per (w, h, band, bits) bucket


def _phash_posting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, band): the phash split into PHASH_BANDS
    contiguous substrings by exact integer arithmetic
    (start = (b*L) div BANDS, mirrored as // in the oracle). Bands
    partition the bit string, so hamming(a,b) <= BANDS-1 forces at
    least one band to match exactly — the same pigeonhole the simhash
    feed relies on, valid at ANY hash length."""
    ph = _phash_frame(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(
                    f"substring(phash, ({b}*length(phash)) div {PHASH_BANDS} + 1,"
                    f" (({b}+1)*length(phash)) div {PHASH_BANDS}"
                    f" - ({b}*length(phash)) div {PHASH_BANDS})"
                ).alias("bits"),
            )
            for b in range(PHASH_BANDS)
        ]
    )
    return ph.select(
        "doc_id",
        "width",
        "height",
        "phash",
        F.explode(bands).alias("_b"),
    ).select(
        "doc_id",
        "width",
        "height",
        "phash",
        F.col("_b.band").alias("band"),
        F.col("_b.bits").alias("bits"),
    )


@register(
    "multimodal_phash_banded_pairs",
    oracle=f"""
    WITH {_PHASH_SQL},
    post AS MATERIALIZED (
      SELECT doc_id, w, h, phash, t.band,
             substr(phash, (t.band*len(phash))//{PHASH_BANDS} + 1,
                    ((t.band+1)*len(phash))//{PHASH_BANDS}
                    - (t.band*len(phash))//{PHASH_BANDS}) AS bits
      FROM ph, (SELECT unnest([0,1,2,3]) AS band) t
    ),
    capped AS MATERIALIZED (
      SELECT * FROM post
      QUALIFY count(*) OVER (PARTITION BY w, h, band, bits)
              <= {PHASH_BUCKET_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.w, a.h,
             a.phash AS pa, b.phash AS pb
      FROM capped a JOIN capped b
        ON a.w = b.w AND a.h = b.h AND a.band = b.band AND a.bits = b.bits
       AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b, w, h,
             len(list_filter(generate_series(1, len(pa)),
                             i -> substr(pa, i, 1) <> substr(pb, i, 1)))
               AS hamming
      FROM cand
    )
    SELECT id_a, id_b, w::INT AS width, h::INT AS height,
           hamming::BIGINT AS hamming
    FROM scored WHERE hamming <= {PHASH_BANDS - 1}
    """,
    description=f"Image near-dup PAIRS: banded perceptual-hash candidate join (pigeonhole-exact to hamming {PHASH_BANDS - 1}), bucket-capped from birth ({PHASH_BUCKET_CAP}, QUALIFY-replayable)",
    tags=("multimodal", "dedup", "join", "governance"),
)
def multimodal_phash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image-side twin of dedup_simhash_banded_pairs_capped, and
    the FIFTH pair feed — born WITH its guard rather than retrofitted
    (shingles r8, simhash/LSH r9, fuzzy blocks r10): tiny or uniform
    images share degenerate all-'0' hashes, so (w, h, band, bits)
    buckets flood exactly like simhash band buckets on boilerplate; the
    count-based bucket cap is in the plan from day one and the spill
    audit below makes every absorbed comparison visible. Banding is
    pigeonhole-EXACT for hamming <= 3 (bands partition the bits, so <=3
    flips cannot touch all 4 bands); the hamming verify runs a bounded
    HOF over candidate pairs only, with exact-dup (hamming 0) pairs
    retained so the feed composes with the cluster step.

    Scale shape: posting = 4 rows/doc; the candidate join shuffles on
    its own (w, h, band, bits) key, which the cap window also rides —
    no extra exchange; per-bucket fan-out <= C(cap, 2) structurally."""
    from pyspark.sql.window import Window

    post = _phash_posting(spark, sf_dir)
    occ = Window.partitionBy("width", "height", "band", "bits")
    capped = post.withColumn("_occ", F.count(F.lit(1)).over(occ)).where(
        F.col("_occ") <= PHASH_BUCKET_CAP
    )
    a = capped.select(
        F.col("doc_id").alias("id_a"),
        "width",
        "height",
        "band",
        "bits",
        F.col("phash").alias("pa"),
    )
    b = capped.select(
        F.col("doc_id").alias("id_b"),
        "width",
        "height",
        "band",
        "bits",
        F.col("phash").alias("pb"),
    )
    cand = (
        a.join(b, ["width", "height", "band", "bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "width", "height", "pa", "pb")
        .distinct()
    )
    scored = cand.withColumn(
        "hamming",
        F.expr(
            "cast(size(filter(sequence(1, length(pa)),"
            " i -> substring(pa, i, 1) <> substring(pb, i, 1))) as bigint)"
        ),
    )
    return scored.where(F.col("hamming") <= PHASH_BANDS - 1).select(
        "id_a", "id_b", "width", "height", "hamming"
    )


@register(
    "multimodal_phash_bucket_spill",
    oracle=f"""
    WITH {_PHASH_SQL},
    post AS MATERIALIZED (
      SELECT doc_id, w, h, phash, t.band,
             substr(phash, (t.band*len(phash))//{PHASH_BANDS} + 1,
                    ((t.band+1)*len(phash))//{PHASH_BANDS}
                    - (t.band*len(phash))//{PHASH_BANDS}) AS bits
      FROM ph, (SELECT unnest([0,1,2,3]) AS band) t
    ),
    occ AS (
      SELECT band, w, h, bits, count(*) AS n
      FROM post GROUP BY band, w, h, bits
    )
    SELECT band,
           count(*)::BIGINT AS n_buckets,
           max(n)::BIGINT   AS max_occupancy,
           sum(CASE WHEN n > {PHASH_BUCKET_CAP} THEN 1 ELSE 0 END)::BIGINT
             AS n_hot,
           sum(CASE WHEN n > {PHASH_BUCKET_CAP}
                    THEN (n * (n - 1)) // 2 ELSE 0 END)::BIGINT
             AS skipped_comparisons
    FROM occ GROUP BY band
    """,
    description="Audit half of the phash bucket cap: per-band occupancy profile + absorbed C(n,2) comparisons (always PHASH_BANDS rows)",
    tags=("multimodal", "dedup", "governance"),
)
def multimodal_phash_bucket_spill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-BAND occupancy rollup of the phash posting (the
    dedup_lsh_hot_bucket_spill shape): bucket counts, the deepest
    bucket, hot-bucket count, and the exact C(n,2) comparisons the cap
    absorbs. Always PHASH_BANDS rows, so the parity row is never
    vacuous even when the cap is a no-op on honest corpora."""
    post = _phash_posting(spark, sf_dir)
    occ = post.groupBy("band", "width", "height", "bits").agg(
        F.count(F.lit(1)).alias("n")
    )
    hot = F.col("n") > PHASH_BUCKET_CAP
    return occ.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_occupancy"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot"),
        F.sum(
            F.when(hot, F.expr("(n * (n - 1)) div 2")).otherwise(F.lit(0))
        ).alias("skipped_comparisons"),
    )


@register(
    "multimodal_real_resample_wav",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             8000 + (n_chars % 5) * 2000 AS src_rate,
             n_chars % 200 + 20          AS n_samples
      FROM documents
    ),
    rs AS (
      SELECT doc_id, src_rate, n_samples,
             n_samples * 4000 // src_rate AS out_samples
      FROM base
    ),
    chk AS (
      SELECT r.doc_id,
             sum(((r.doc_id * 31 + (g.i * r.src_rate // 4000) * 7) % 65536)
                 - 32768)::BIGINT AS pcm_sum
      FROM rs r, LATERAL unnest(generate_series(0, r.out_samples - 1)) AS g(i)
      GROUP BY r.doc_id
    )
    SELECT r.doc_id,
           r.src_rate::INT      AS src_rate,
           r.n_samples::BIGINT  AS n_samples,
           r.out_samples::BIGINT AS out_samples,
           (r.out_samples * 1000 // 4000)::BIGINT AS duration_ms,
           c.pcm_sum
    FROM rs r JOIN chk c USING (doc_id)
    """,
    description="REAL audio decode+resample: valid RIFF/WAVE PCM16 payloads parsed by a chunk-walking byte parser, ZOH-resampled to 4 kHz in mapInPandas — rates, counts, and the resampled sample SUM oracled",
    tags=("multimodal",),
)
def multimodal_real_resample_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of multimodal_real_decode_ppm (r9 VERDICT task
    #5: promote one more real codec out of stub-land). Each document
    becomes a VALID RIFF/WAVE container — 'RIFF' header, 16-byte PCM
    'fmt ' chunk, int16-LE 'data' frames (multimodal/binary.py
    wav_serialize) — with per-doc sample rate and length derived from
    n_chars, then the REAL parser (wav_decode: chunk walker, struct
    unpack, numpy frame decode) extracts the rate from the HEADER BYTES
    and zero-order-hold-resamples to 4 kHz. The oracle recomputes
    src_rate/n_samples from n_chars, out_samples from the exact integer
    resample arithmetic, and pcm_sum by replaying the ZOH index map
    over the deterministic sample sequence — a stub that skips byte
    parsing cannot produce the right sum because the rate (and thus the
    index stride) varies per document. resample_audio_stub remains the
    labeled metadata-only fallback for non-WAV payloads.

    Scale shape: one Arrow-batched map stage, partition-preserving,
    payloads never leave their split; at 100 TB this is the canonical
    embarrassingly-parallel media pass (decode cost ~ bytes scanned,
    no shuffle)."""
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_wav_payloads,
        resample_audio,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resample_audio(attach_wav_payloads(docs), dst_rate=4_000)


@register(
    "multimodal_audio_vad_segments",
    oracle="""
    WITH base AS (
      SELECT doc_id, n_chars % 200 + 20 AS n_samples FROM documents
    ),
    samp AS (
      SELECT b.doc_id, g.i // 16 AS w,
             ((b.doc_id * 31 + g.i * 7919) % 65536) - 32768 AS s
      FROM base b,
           LATERAL unnest(generate_series(0, (b.n_samples // 16) * 16 - 1)) AS g(i)
    ),
    wen AS (
      SELECT doc_id, w, sum(s * s)::BIGINT AS sum_sq
      FROM samp GROUP BY doc_id, w
    ),
    act AS (
      SELECT doc_id, w,
             CASE WHEN sum_sq >= 5700000000 THEN 1 ELSE 0 END AS a
      FROM wen
    ),
    runs AS (
      SELECT doc_id, a,
             w - row_number() OVER (PARTITION BY doc_id, a ORDER BY w) AS grp
      FROM act
    ),
    runlen AS (
      SELECT doc_id, grp, count(*) AS rl
      FROM runs WHERE a = 1 GROUP BY doc_id, grp
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_windows, sum(a)::BIGINT AS n_active
      FROM act GROUP BY doc_id
    )
    SELECT g.doc_id,
           g.n_windows::BIGINT AS n_windows,
           g.n_active,
           round(g.n_active * 1.0 / g.n_windows, 6) AS active_frac,
           coalesce(max(r.rl), 0)::BIGINT AS longest_active_run
    FROM agg g LEFT JOIN runlen r ON g.doc_id = r.doc_id
    GROUP BY g.doc_id, g.n_windows, g.n_active
    """,
    description="Speech-curation VAD shape: short-time energy per 16-sample window over REAL decoded PCM, thresholded to activity ratio + longest active run (gaps-and-islands)",
    tags=("multimodal", "window"),
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection, the decode-at-edge / analyze-in-engine
    split: the Arrow kernel (multimodal/binary.vad_energy_windows) only
    parses the RIFF container and emits one (doc, window, sum-of-
    squares) row per 16-sample window; thresholding, the activity
    ratio, and the LONGEST ACTIVE RUN (the segmentation statistic an
    audio-curation filter keys on) are DataFrame work — a gaps-and-
    islands window pass (w - row_number over (doc, active)) Catalyst
    plans like any sessionization. Payloads use stride 7919 (wraps the
    int16 range inside every window, so energies vary window-to-window;
    stride-7 payloads would make every window of a doc near-identical)
    and the threshold sits at the uniform-PCM expected energy
    16 * 32768^2 / 3 ≈ 5.7e9, splitting windows both ways. All energy
    arithmetic is exact int64 — sums, threshold, and run lengths replay
    in SQL term-for-term.

    Scale shape: one partition-preserving Arrow pass (rows out ~
    samples/16), then hash aggregation + two doc-keyed window passes —
    everything keys on doc_id, so the exchanges reuse one
    partitioning; nothing is corpus-global."""
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_wav_payloads,
        vad_energy_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    wen = vad_energy_windows(
        attach_wav_payloads(docs, step=7919), window=16
    )
    act = wen.select(
        "doc_id",
        "w",
        F.when(F.col("sum_sq") >= 5_700_000_000, 1).otherwise(0).alias("a"),
    )
    grp = act.withColumn(
        "grp",
        F.col("w")
        - F.row_number().over(
            Window.partitionBy("doc_id", "a").orderBy("w")
        ),
    )
    runlen = (
        grp.where(F.col("a") == 1)
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("rl"))
    )
    agg = act.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("a").alias("n_active"),
    )
    return (
        agg.join(runlen, "doc_id", "left")
        .groupBy("doc_id", "n_windows", "n_active")
        .agg(F.coalesce(F.max("rl"), F.lit(0)).alias("longest_active_run"))
        .select(
            "doc_id",
            "n_windows",
            "n_active",
            F.round(F.col("n_active") * F.lit(1.0) / F.col("n_windows"), 6).alias(
                "active_frac"
            ),
            "longest_active_run",
        )
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, f.i - 1 AS frame_no, (f.i - 1) * 256 AS "offset"
    FROM documents,
         LATERAL (SELECT unnest(generate_series(
           1, greatest(octet_length(encode(text)) // 256, 1))) AS i) f
    """,
    description="mapInPandas 1->N frame-sampling fan-out (video->frames shape)",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_fake_payloads,
        sample_frames_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames_stub(attach_fake_payloads(docs), every_n_bytes=256)


@register(
    "stream_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_sec,
           round(p.value, 6) AS purchase_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 86400 SECOND AND p.ts
    """,
    description="Stream-stream interval join (purchase <- same-user clicks within 24h), availableNow drain",
    tags=("streaming", "join"),
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        interval_join_streams,
        read_event_stream,
        run_available_now,
    )

    # Two independent stream readers over the same staged directory —
    # a genuine two-source stream-stream join, not a self-reference.
    d = _stage_dir(sf_dir, copies=1)
    joined = interval_join_streams(
        read_event_stream(spark, d), read_event_stream(spark, d)
    )
    out = run_available_now(
        joined,
        f"ij_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=4,  # 4 join state stores/partition; 6.5 s (sp=32) -> 2.2 s
        # r14: an INNER stream-stream join emits every match eagerly in
        # the batch that reads it — the trailing no-data micro-batch
        # (watermark bookkeeping only) appends nothing to the sink and
        # costs a full ~0.7 s micro-batch cycle (planning + 2x4 state
        # commits + checkpoint fsync). Outer variants NEED that batch
        # (absence rows emit there); this one provably does not.
        extra_confs={"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    )
    return out.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts_s"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts_s"),
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias("delay_sec"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "stream_interval_join_outer",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_sec,
           round(p.value, 6) AS purchase_value
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 86400 SECOND AND p.ts
    WHERE p.event_type = 'purchase'
    """,
    description="Stream-stream LEFT OUTER interval join: unmatched purchases emit null-click rows only once the global watermark proves no in-bound click can arrive",
    tags=("streaming", "join"),
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer attribution shape — the part a batch LEFT JOIN gets
    for free but a stream must EARN from the watermark: a null-click
    row is a claim about absence, emittable only when the global
    watermark (min across both sides' nodes) passes the last instant
    an in-bound click could still arrive. Far-future sentinels must
    therefore pass BOTH sides' event-type pre-filters
    (keep_sentinels=True) to advance both watermark nodes under the
    bounded drain; their own join output is dropped by key sign
    (sentinel event_ids are negative). Same state-eviction bounds as
    the inner variant; matched rows still emit eagerly."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        interval_join_streams,
        read_event_stream,
        run_available_now,
    )

    d = _stage_dir(sf_dir, copies=1)
    _write_watermark_sentinels(spark, sf_dir, d, n=2)
    # r14: one data batch, not two. At maxFilesPerTrigger=2 the drain
    # ran {events+sentinel1}, {sentinel2}, {no-data} — three
    # micro-batch cycles at ~0.7-1.0 s of fixed overhead each. All
    # three files in ONE batch still advances both sides' watermark
    # nodes at its end (sentinels ride batch 0), and the standard
    # no-data batch then emits every watermark-proven absence row —
    # identical sink contents (oracle re-verified), one fewer cycle.
    joined = interval_join_streams(
        read_event_stream(spark, d),
        read_event_stream(spark, d),
        how="left_outer",
        keep_sentinels=True,
    )
    out = run_available_now(
        joined,
        f"ijo_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=4,  # 4 join state stores/partition; 3.9 s (sp=8) -> 3.2 s
    )
    return out.where(F.col("purchase_id") >= 0).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts_s"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts_s"),
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias("delay_sec"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "stream_interval_join_full",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           coalesce(p.user_id, c.user_id) AS user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_sec,
           round(p.value, 6) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 86400 SECOND AND p.ts
    """,
    description="Stream-stream FULL OUTER interval join: absence rows in BOTH directions, each watermark-proven",
    tags=("streaming", "join"),
)
def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the stream-stream join family: clicks that attributed
    no purchase emit null-purchase rows AND purchases with no prior
    click emit null-click rows — both absence claims deferred until the
    global watermark proves them, both sides' state still evicted on
    the interval bound. The batch twin is a plain FULL JOIN with the
    side filters INSIDE the subqueries (an ON-clause event-type filter
    would instead null-extend the filtered-out rows). Sentinel rows can
    surface from either side here, so the key-sign drop must be
    null-safe on both ids."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.streaming.incremental import (
        interval_join_streams,
        read_event_stream,
        run_available_now,
    )

    d = _stage_dir(sf_dir, copies=1)
    _write_watermark_sentinels(spark, sf_dir, d, n=2)
    # r14: same one-data-batch drain as the left-outer twin (see its
    # comment) — sentinels in batch 0, absence rows in the no-data
    # batch, one micro-batch cycle fewer.
    joined = interval_join_streams(
        read_event_stream(spark, d),
        read_event_stream(spark, d),
        how="full_outer",
        keep_sentinels=True,
    )
    out = run_available_now(
        joined,
        f"ijf_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=4,  # same operating point as the left-outer twin
    )
    keep = (F.col("purchase_id").isNull() | (F.col("purchase_id") >= 0)) & (
        F.col("click_id").isNull() | (F.col("click_id") >= 0)
    )
    return out.where(keep).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts_s"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("c_ts_s"),
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias("delay_sec"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             (octet_length(encode(text)) % 640 + 1)::INTEGER AS w,
             (octet_length(encode(text)) % 480 + 1)::INTEGER AS h
      FROM documents
    )
    SELECT doc_id, w AS src_w, h AS src_h,
           least(w, (w * 224) // greatest(w, h))::INTEGER AS out_w,
           least(h, (h * 224) // greatest(w, h))::INTEGER AS out_h
    FROM m
    """,
    description="Aspect-preserving resize target dims (metadata-only projection; codec stubbed)",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_fake_payloads,
        resize_image_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resize_image_stub(attach_fake_payloads(docs), max_side=224)


@register(
    "multimodal_audio_resample",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))::BIGINT AS src_samples,
           (octet_length(encode(text))::BIGINT * 16000) // 44100 AS out_samples,
           (((octet_length(encode(text))::BIGINT * 16000) // 44100) * 1000) // 16000
             AS duration_ms
    FROM documents
    """,
    description="Audio resample arithmetic contract (44.1kHz -> 16kHz; filter stubbed)",
    tags=("multimodal",),
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_fake_payloads,
        resample_audio_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resample_audio_stub(attach_fake_payloads(docs))


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           list_sum(list_transform(range(length(text)),
                                   i -> ord(substr(text, i + 1, 1))))::BIGINT
             // greatest(length(text), 1) AS brightness,
           octet_length(encode(text))::BIGINT AS n_bytes
    FROM documents
    """,
    description="mapInPandas feature-extraction stub, value-checked (mean byte 'brightness')",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-extraction plumbing (Arrow batches -> struct column)
    value-checked: the fake 'brightness' (mean payload byte) is
    SQL-expressible because the synthetic corpus is ASCII, so DuckDB's
    per-char ord() equals the UTF-8 byte."""
    from crypto_etl_pipeline_spark.multimodal.binary import (
        attach_fake_payloads,
        extract_features_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = extract_features_stub(attach_fake_payloads(docs))
    return out.select(
        "doc_id",
        F.col("feature.brightness").alias("brightness"),
        F.col("feature.n_bytes").alias("n_bytes"),
    )


@register(
    "stream_sketch_rollup",
    oracle="""
    SELECT event_type,
           least(greatest(cast(floor(value / 5.0) AS BIGINT), 0), 99) AS bin,
           count(*) AS c
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    description="Streaming continuous aggregate: per-micro-batch fixed-bin histogram sketches merged by addition == one batch GROUP BY",
    tags=("streaming", "sketch"),
)
def stream_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives run_sketch_rollup_stream end to end: the event files
    stream in micro-batches, each batch reduces to fixed-bin counts,
    and the running sketch is merged by addition into versioned
    snapshots (exactly-once recovery discipline). Because histogram
    merge is associative and commutative, the drained result must
    equal the single batch GROUP BY the oracle runs — THE defining
    property of a mergeable-sketch continuous aggregate."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_sketch_rollup_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    return run_sketch_rollup_stream(
        events,
        sketch_dir=_tmpdir("sketch_"),
        checkpoint_dir=_checkpoint(),
        bin_width=5.0,
        n_bins=100,
    )


@register(
    "stream_sketch_quantiles",
    oracle="""
    WITH sketch AS (
      SELECT event_type,
             least(greatest(cast(floor(value / 5.0) AS BIGINT), 0), 99) AS bin,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS total
      FROM sketch
    ),
    est AS (
      SELECT event_type, total,
             min(CASE WHEN cum >= 0.50 * total THEN bin END) AS b50,
             min(CASE WHEN cum >= 0.95 * total THEN bin END) AS b95
      FROM cum GROUP BY event_type, total
    )
    SELECT e.event_type,
           e.total::BIGINT AS n_rows,
           round(5.0 * (e.b50 + (0.50 * e.total - c50.cum + c50.c) / c50.c), 6) AS est_p50,
           round(5.0 * (e.b95 + (0.95 * e.total - c95.cum + c95.c) / c95.c), 6) AS est_p95
    FROM est e
    JOIN cum c50 ON c50.event_type = e.event_type AND c50.bin = e.b50
    JOIN cum c95 ON c95.event_type = e.event_type AND c95.bin = e.b95
    """,
    description="Continuous-aggregate READ side: quantiles interpolated from micro-batch-merged sketch state == one batch computation",
    tags=("streaming", "sketch", "window"),
)
def stream_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the continuous-aggregate loop: the WRITE side merges
    fixed-bin histograms per micro-batch (stream_sketch_rollup); this
    READ side interpolates p50/p95 from that streamed state via
    operators/sketch.quantile_from_sketch — and because sketch merge is
    associative/commutative, the result must equal the same math over a
    single batch GROUP BY, which is what the oracle computes. This is
    how a 100 TB hypertable serves percentile dashboards without ever
    re-touching raw history."""
    from crypto_etl_pipeline_spark.operators.sketch import quantile_from_sketch
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_sketch_rollup_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    merged = run_sketch_rollup_stream(
        events,
        sketch_dir=_tmpdir("sketchq_"),
        checkpoint_dir=_checkpoint(),
        bin_width=5.0,
        n_bins=100,
    )
    return quantile_from_sketch(
        merged,
        "event_type",
        {"est_p50": 0.50, "est_p95": 0.95},
        lo=F.lit(0.0),
        width=F.lit(5.0),
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           c.c_mktsegment       AS segment,
           count(*)             AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    description="Stream-static broadcast enrichment: event stream joined to the customer dimension, watermarked hourly rollup per market segment",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical streaming-ETL enrichment shape: a fact stream
    joined against a STATIC dimension (stream-static joins are
    stateless — each micro-batch joins the dim as of that batch, no
    watermark state). The dimension is broadcast, so the stream side
    never shuffles for the join; the only stateful operator is the
    downstream watermarked window aggregate.

    Round-5 change (VERDICT r4 #4): runs in APPEND mode with
    watermark-closed emission — a continuous 100 TB stream in
    'complete' mode re-emits (and keeps state for) every window ever
    seen, so state grows with the key domain; append emits each window
    exactly once when the watermark passes it and then DROPS its state
    (tests/test_round5_ops.py asserts the final state-store row count
    is 0). Full emission under an AvailableNow drain is forced by two
    far-future sentinel files (see _write_watermark_sentinels); the
    watermark sits UPSTREAM of the join so the sentinels advance event
    time even though user_id=-1 never matches the dimension and they
    never enter the aggregate.

    At 100 TB/day the same plan holds as long as the dim is
    broadcast-sized; a fact-sized dim would move this to the
    foreachBatch CDC path (streaming/incremental.py) instead."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_available_now,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stage = _stage_dir(sf_dir, copies=1)
    _write_watermark_sentinels(spark, sf_dir, stage, n=2)
    # 2 micro-batches: {events, sentinel#1} then {sentinel#2} — the
    # first advances the watermark past every real window, the second
    # triggers their append emission (mtime ordering groups the files).
    events = read_event_stream(spark, stage, max_files_per_trigger=2)
    # customer is SF-scaled — no broadcast hint; Spark re-plans the
    # static side per micro-batch and broadcasts only while it fits.
    enriched = events.withWatermark("ts", "2 hours").join(
        dim, events.user_id == dim.c_custkey
    )
    rolled = (
        enriched.groupBy(F.window("ts", "1 hour").alias("win"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
    )
    return run_available_now(
        rolled,
        f"enrich_{uuid.uuid4().hex[:8]}",
        _checkpoint(),
        output_mode="append",
        state_partitions=8,  # ~3.4k window keys; sized to state, not batch shuffle
    )


@register(
    "stream_heavy_hitters",
    oracle="""
    WITH tot AS (SELECT count(*) AS n FROM events)
    SELECT event_type AS term,
           count(*)   AS n_occurrences,
           round(count(*) / (SELECT n FROM tot), 6) AS share
    FROM events
    GROUP BY event_type
    HAVING count(*) * 5 > (SELECT n FROM tot)
    """,
    description="Streaming Misra-Gries store (<= k-1 rows of state, mergeable across micro-batches) + exact read-side verify == batch GROUP BY HAVING",
    tags=("streaming", "sketch", "heavy-hitters"),
)
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-domain continuous aggregate, closed end to end:
    the WRITE side folds each micro-batch's Misra-Gries summary into a
    versioned <= k-1-row store (run_mg_stream — state bounded whatever
    the stream length); the READ side verifies the streamed candidate
    superset exactly against the events table and keeps strictly
    count*k > n. k=5 over 5 event types forces real counter evictions
    in every batch summary, so the result being exactly the oracle's
    GROUP BY HAVING exercises the mergeable-summaries error bound, not
    a trivially-complete counter set."""
    from crypto_etl_pipeline_spark.operators.sketch import verify_heavy_hitters
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_mg_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    store = run_mg_stream(
        events,
        store_dir=_tmpdir("mgstore_"),
        checkpoint_dir=_checkpoint(),
        term_col="event_type",
        k=5,
    )
    batch = load_table(spark, sf_dir, "events")
    return verify_heavy_hitters(batch, "event_type", store.select("term"), k=5)


@register(
    "late_data_profile",
    oracle="""
    WITH arr AS (
      SELECT event_id, ts,
             max(ts) OVER (ORDER BY event_id
                           ROWS UNBOUNDED PRECEDING) AS frontier
      FROM events
    ),
    lat AS (
      SELECT (epoch_us(frontier) - epoch_us(ts)) / 1000000.0 AS late_s
      FROM arr
    )
    SELECT count(*) AS n_events,
           sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
           round(quantile_cont(late_s, 0.5), 3)  AS late_p50_s,
           round(quantile_cont(late_s, 0.95), 3) AS late_p95_s,
           round(quantile_cont(late_s, 0.99), 3) AS late_p99_s,
           round(max(late_s), 3) AS late_max_s,
           sum(CASE WHEN late_s > 3600 THEN 1 ELSE 0 END)::BIGINT
             AS n_beyond_1h,
           sum(CASE WHEN late_s > 7200 THEN 1 ELSE 0 END)::BIGINT
             AS n_beyond_2h
    FROM lat
    """,
    description="Event-time lateness profile vs the arrival frontier: the measurement that SIZES a watermark",
    tags=("streaming", "window", "quality"),
)
def late_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarks are chosen, not guessed — this is the measurement
    they are chosen FROM: each event's lateness is the gap between its
    event time and the running event-time frontier at its arrival
    (arrival order = event_id in this corpus — the generator's append
    order). The p95/p99/max lateness quantiles map directly onto the
    withWatermark delay that keeps (1 - p) of data, and the
    beyond-1h/2h counts are exactly the rows the registered 1-2 h
    watermarks would drop. One ordered-frontier window (running max
    over arrival order — at scale, per arrival shard + shard offsets,
    the global_sequence_ids pattern) plus a single exact-quantile
    aggregate."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    late = ev.select(
        (
            (F.unix_micros(F.max("ts").over(w)) - F.unix_micros(F.col("ts")))
            / 1_000_000.0
        ).alias("late_s")
    )
    q = F.percentile(F.col("late_s"), F.lit([0.5, 0.95, 0.99]))
    return late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
        F.round(q.getItem(0), 3).alias("late_p50_s"),
        F.round(q.getItem(1), 3).alias("late_p95_s"),
        F.round(q.getItem(2), 3).alias("late_p99_s"),
        F.round(F.max("late_s"), 3).alias("late_max_s"),
        F.sum((F.col("late_s") > 3600).cast("long")).alias("n_beyond_1h"),
        F.sum((F.col("late_s") > 7200).cast("long")).alias("n_beyond_2h"),
    )


KMV_STREAM_K = 64


@register(
    "stream_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS grp,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ),
    sk AS (SELECT grp, h FROM (
             SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
             FROM h) WHERE rk <= {KMV_STREAM_K}),
    est AS (SELECT grp, count(*) AS sketch_size, max(h) AS hk FROM sk GROUP BY grp)
    SELECT grp, sketch_size,
           round(CASE WHEN sketch_size < {KMV_STREAM_K} THEN sketch_size::DOUBLE
                      ELSE {KMV_STREAM_K - 1}.0 / (hk::DOUBLE / 1152921504606846976.0)
                 END, 6) AS distinct_est
    FROM est
    """,
    description="Streaming distinct-user estimate via mergeable KMV state: drained micro-batch merges == one-shot batch sketch",
    tags=("streaming", "sketch", "approx"),
)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cardinality member of the mergeable-state family
    (histogram -> stream_sketch_rollup, Misra-Gries ->
    stream_heavy_hitters, KMV -> this): distinct users per event type
    from a drained file stream, state bounded at groups x k hashes
    forever. Because min-k-of-union is associative and commutative,
    the drained multi-batch merge MUST equal the one-shot batch sketch
    the oracle computes — replay order cannot change the result, which
    is the exactly-once argument in one algebraic property. KMV over
    HLL here because the same sketch also intersects
    (sketch_kmv_audience_overlap) — one state representation serves
    both dashboards."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_kmv_distinct_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    return run_kmv_distinct_stream(
        events,
        store_dir=_tmpdir("kmv_store_"),
        checkpoint_dir=_checkpoint(),
        k=KMV_STREAM_K,
    )


@register(
    "stream_incremental_mv_merge",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value), 4)  AS sum_value,
           round(min(value), 6)  AS min_value,
           round(max(value), 6)  AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    description=(
        "Streaming materialized-view maintenance: per-micro-batch "
        "count/sum/min/max partials merged into versioned MV snapshots "
        "== one batch GROUP BY (the exact-aggregate continuous "
        "aggregate)"
    ),
    tags=("streaming", "agg", "incremental"),
)
def stream_incremental_mv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming half of the lambda architecture whose batch half
    is incremental_rollup_merge: event files arrive in micro-batches,
    each reduces to (hour, type) count/sum/min/max partials, and the
    running MV merges them (add / add / least / greatest — all
    associative + commutative, so the drained state must equal the
    oracle's single batch GROUP BY regardless of batch boundaries or
    replay order). Versioned snapshots + strictly-below-batch-id
    recovery give exactly-once MV maintenance; state is hours x types
    regardless of stream length. Note min/max ARE maintainable here
    because the MV is insert-only — under deletes they'd need the
    full CDC snapshot path (run_cdc_stream)."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_mv_rollup_stream,
    )

    events = read_event_stream(spark, _stage_dir(sf_dir, copies=1))
    return run_mv_rollup_stream(
        events,
        store_dir=_tmpdir("mv_rollup_"),
        checkpoint_dir=_checkpoint(),
    )
