"""Source/sink round-trips (S1-S4) and incremental availableNow runs."""

from __future__ import annotations

import os

import pytest
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    from crypto_etl_pipeline_spark.sources.csv import read_csv_inferred
    from crypto_etl_pipeline_spark.sources.sinks import write_csv

    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, None, None), (3, 'quo"te', -0.25)],
        "id long, s string, v double",
    )
    out = str(tmp_path / "csv_out")
    write_csv(df, out, single_file=True)
    back = read_csv_inferred(spark, out).orderBy("id").collect()
    assert [tuple(r) for r in back] == [(1, "a,b", 1.5), (2, None, None), (3, 'quo"te', -0.25)]


def test_parquet_roundtrip_with_partitioning(spark, tmp_path):
    from crypto_etl_pipeline_spark.sources.sinks import write_parquet

    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "x", 3.0)], "id long, k string, v double"
    )
    out = str(tmp_path / "pq_out")
    write_parquet(df, out, partition_by=["k"])
    assert os.path.isdir(os.path.join(out, "k=x"))  # partition pruning layout
    back = spark.read.parquet(out)
    assert back.where(F.col("k") == "x").count() == 2
    assert {r["id"] for r in back.collect()} == {1, 2, 3}


def test_timestamped_sink_naming(spark, tmp_path):
    from crypto_etl_pipeline_spark.sources.sinks import write_timestamped_csv

    df = spark.createDataFrame([(1,)], "id long")
    path = write_timestamped_csv(
        df, str(tmp_path), "crypto_api_classified", now=datetime(2026, 8, 13, 5, 4, 3)
    )
    assert path.endswith("crypto_api_classified_20260813_050403")
    assert os.path.isdir(path)


def test_rest_source_with_mock_fetch(spark):
    from crypto_etl_pipeline_spark.sources.rest import API_SCHEMA, rest_source

    rows = [
        {  # extra fields are projected away; missing fields -> null
            "symbol": "btc",
            "current_price": 50000.0,
            "price_change_percentage_24h": 2.5,
            "market_cap": 1e12,
            "total_volume": 3e10,
            "high_24h": 51000.0,
            "low_24h": None,
            "image": "ignored",
            "ath": 69000,
        },
        {"symbol": "eth", "current_price": 3000.0},
    ]
    df = rest_source(spark, fetch=lambda: rows)
    assert df.schema == API_SCHEMA
    got = {r["symbol"]: r for r in df.collect()}
    assert got["btc"]["market_cap"] == 1e12 and got["btc"]["low_24h"] is None
    assert got["eth"]["price_change_percentage_24h"] is None


def test_rest_source_failure_yields_empty(spark):
    from crypto_etl_pipeline_spark.sources.rest import rest_source

    df = rest_source(spark, fetch=lambda: [])
    assert df.isEmpty() and len(df.schema.fields) == 7


def test_rest_retry_backoff_schedule_and_success():
    """Transient 429s retry on the exponential schedule, then succeed."""
    from crypto_etl_pipeline_spark.sources.rest import (
        RetryableHTTPError,
        coingecko_fetch_with_retry,
    )

    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise RetryableHTTPError("HTTP 429")
        return [{"symbol": "btc"}]

    rows = coingecko_fetch_with_retry(get=flaky, sleep=delays.append, base_delay=1.0)
    assert rows == [{"symbol": "btc"}]
    assert delays == [1.0, 2.0, 4.0]
    assert calls["n"] == 4


def test_rest_retry_exhaustion_caps_delay_and_yields_empty():
    """Persistent 5xx: delays cap at max_delay, exhaustion returns []
    (the reference's empty-table error contract, P:77-79)."""
    from crypto_etl_pipeline_spark.sources.rest import (
        RetryableHTTPError,
        coingecko_fetch_with_retry,
    )

    delays = []

    def always_down():
        raise RetryableHTTPError("HTTP 503")

    rows = coingecko_fetch_with_retry(
        get=always_down, sleep=delays.append, max_retries=3, base_delay=10.0, max_delay=15.0
    )
    assert rows == []
    assert delays == [10.0, 15.0, 15.0]


def test_rest_retry_permanent_error_fails_fast():
    """Non-retryable failures (4xx other than 429, parse errors) return
    [] immediately — no sleeps burned on a permanent condition."""
    from crypto_etl_pipeline_spark.sources.rest import coingecko_fetch_with_retry

    delays = []

    def bad_request():
        raise ValueError("HTTP 400")

    assert coingecko_fetch_with_retry(get=bad_request, sleep=delays.append) == []
    assert delays == []


def test_rest_retry_network_errors_are_transient(spark):
    """OSError subclasses (requests' ConnectionError/Timeout ancestors)
    retry; the recovered rows flow into the normal rest_source path."""
    from crypto_etl_pipeline_spark.sources.rest import (
        coingecko_fetch_with_retry,
        rest_source,
    )

    calls = {"n": 0}

    def net_flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConnectionResetError("peer reset")
        return [{"symbol": "eth", "current_price": 2000.0}]

    df = rest_source(
        spark, fetch=lambda: coingecko_fetch_with_retry(get=net_flaky, sleep=lambda _: None)
    )
    got = df.collect()
    assert [r["symbol"] for r in got] == ["eth"]
    assert got[0]["current_price"] == 2000.0


def test_available_now_processes_only_new_files(spark, tmp_path):
    """Exactly-once incremental cadence: a second availableNow run with
    the same checkpoint ingests only files that arrived in between —
    the reference's 6-hourly cron re-reads everything from scratch."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_available_now,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    input_dir = str(tmp_path / "arrivals")
    os.makedirs(input_dir)
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "sink")

    def drain(tag):
        ev = read_event_stream(spark, input_dir)
        q = (
            ev.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink_dir).count()

    os.symlink(src, os.path.join(input_dir, "batch1.parquet"))
    assert drain("first") == 1000

    # no new files -> second drain adds nothing
    assert drain("second") == 1000

    # one new file -> only its rows are appended (not a full re-read)
    shutil.copy(src, os.path.join(input_dir, "batch2.parquet"))
    assert drain("third") == 2000


def test_market_rest_datasource_paginated(spark):
    """Spark 4 Python DataSource: one InputPartition per page, mock
    transport, fixed 7-column schema, classifier composes on top."""
    from crypto_etl_pipeline_spark.sources.rest import API_SCHEMA
    from crypto_etl_pipeline_spark.sources.rest_datasource import MarketRestDataSource

    spark.dataSource.register(MarketRestDataSource)
    df = (
        spark.read.format("market_rest")
        .option("pages", 3)
        .option("per_page", 50)
        .option("transport", "mock")
        .load()
    )
    assert df.schema == API_SCHEMA
    assert df.rdd.getNumPartitions() == 3          # one partition per page
    assert df.count() == 150
    syms = {r["symbol"] for r in df.select("symbol").collect()}
    assert "coin1" in syms and "coin150" in syms and len(syms) == 150

    # EP2 composes directly on the source
    from crypto_etl_pipeline_spark.plans.api import classify_api_table

    labeled = classify_api_table(df)
    assert labeled.where(F.col("tendencia").isNull()).count() == 0


def test_binaryfile_source_reads_payloads(spark, tmp_path):
    """spark.read.format('binaryFile'): the documented ingest path for
    multimodal payloads (§2.13) — path/length/content columns."""
    blobs = {"a.bin": b"\x00\x01payload-a", "b.bin": b"payload-b" * 100}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    got = {r["path"].split("/")[-1]: (r["length"], bytes(r["content"])) for r in df.collect()}
    assert got["a.bin"] == (11, blobs["a.bin"])
    assert got["b.bin"] == (900, blobs["b.bin"])

    from crypto_etl_pipeline_spark.multimodal.binary import decode_image_stub

    media = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
    )
    decoded = decode_image_stub(media)
    assert decoded.count() == 2
    assert {r["n_bytes"] for r in decoded.collect()} == {11, 900}


def _write_event_file(spark, path, rows):
    """rows: (event_id, ts_epoch_sec, user_id, value). Written with ts as
    ns-long, matching the testdata's file layout. The file stream source
    lists plain FILES, so the single part-file is moved to ``path``
    (a directory-shaped parquet write would be invisible to it)."""
    import glob

    df = spark.createDataFrame(
        [(eid, int(sec * 1_000_000_000), uid, "click", v, "{}") for eid, sec, uid, v in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    tmp = path + "_dir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)


def test_sessionize_two_drains_identical(spark, tmp_path):
    """timeout='none' output is a pure function of the input: two
    independent drains of the same files emit identical session rows
    (no wall-clock dependence — the ProcessingTimeTimeout hazard)."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_available_now,
        sessionize_stream,
    )

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    os.symlink(
        "/root/testdata/sf0.001/events.parquet", os.path.join(input_dir, "e.parquet")
    )

    def drain(tag):
        ev = read_event_stream(spark, input_dir)
        out = run_available_now(
            sessionize_stream(ev, gap_seconds=6 * 3600, timeout="none"),
            f"sess_det_{tag}",
            str(tmp_path / f"ckpt_{tag}"),
            output_mode="append",
        )
        return sorted(map(repr, (tuple(r) for r in out.collect())))

    assert drain("a") == drain("b")


def test_sessionize_event_timeout_flushes_idle(spark, tmp_path):
    """timeout='event': once the watermark passes session_end + gap, an
    idle user's session flushes WITHOUT a closing event — the bounded-
    state production mode (EventTimeTimeout, not wall clock)."""
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_available_now,
        sessionize_stream,
    )

    from crypto_etl_pipeline_spark.streaming.incremental import sessionize_stream as _sess

    t0 = 1_700_000_000  # fixed epoch base
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain():
        # parquet sink: the only sink kind that recovers stateful
        # progress from the checkpoint across separate drains
        ev = read_event_stream(spark, input_dir)
        q = (
            sessionize_stream(ev, gap_seconds=600, timeout="event", watermark="10 seconds")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        try:
            return [tuple(r) for r in spark.read.parquet(sink).collect()]
        except Exception:  # sink dir still empty
            return []

    # drain 1: user 1 has a 2-event session; nothing can flush yet
    _write_event_file(spark, os.path.join(input_dir, "f1.parquet"),
                      [(1, t0, 1, 1.0), (2, t0 + 30, 1, 2.0)])
    assert drain() == []

    # drain 2: a much-later event from ANOTHER user advances the
    # watermark far past user 1's end + gap; drain 3 then fires the
    # event-time timeout against that watermark and emits user 1's idle
    # session (never closed by an event of its own)
    _write_event_file(spark, os.path.join(input_dir, "f2.parquet"),
                      [(3, t0 + 86_400, 2, 5.0)])
    drain()
    _write_event_file(spark, os.path.join(input_dir, "f3.parquet"),
                      [(4, t0 + 2 * 86_400, 2, 7.0)])
    rows = drain()
    assert any(r[0] == 1 and r[3] == 2 and abs(r[4] - 3.0) < 1e-9 for r in rows), rows


def test_cdc_stream_maintains_snapshot(spark, tmp_path):
    """foreachBatch CDC loop: draining a stream of changeset files
    yields the same snapshot as applying the merged changeset in batch —
    and maxFilesPerTrigger=1 forces MULTIPLE sequential micro-batches,
    so the version chaining is actually exercised."""
    from crypto_etl_pipeline_spark.operators.cdc import apply_changeset
    from crypto_etl_pipeline_spark.streaming.incremental import run_cdc_stream

    snap = spark.createDataFrame([(k, f"v{k}") for k in range(8)], "k long, v string")
    c1 = [(1, "a", "U", 1), (2, "b", "U", 1), (3, None, "D", 1)]
    c2 = [(1, "a2", "U", 2), (9, "new", "I", 2), (2, None, "D", 2)]
    schema = "k long, v string, op string, seq long"

    in_dir = str(tmp_path / "changes")
    os.makedirs(in_dir)
    for i, rows in enumerate([c1, c2]):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as g

        shutil.move(g.glob(tmp + "/part-*.parquet")[0], os.path.join(in_dir, f"c{i}.parquet"))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    final = run_cdc_stream(
        stream, snap, str(tmp_path / "snap"), "k", str(tmp_path / "ckpt")
    )
    got = sorted((r["k"], r["v"]) for r in final.collect())

    merged = spark.createDataFrame(c1 + c2, schema)
    want = sorted(
        (r["k"], r["v"]) for r in apply_changeset(snap, merged, key="k").collect()
    )
    assert got == want
    assert (1, "a2") in got and (9, "new") in got
    assert all(k not in (2, 3) for k, _ in got)


def test_cdc_stream_retention_bounds_versions(spark, tmp_path):
    """Snapshot retention: a 4-micro-batch drain with retain_versions=2
    must leave exactly the two newest v{n} dirs (no unbounded chain, no
    _gc_ residue) while still producing the batch-equivalent snapshot."""
    from crypto_etl_pipeline_spark.operators.cdc import apply_changeset
    from crypto_etl_pipeline_spark.streaming.incremental import run_cdc_stream

    snap = spark.createDataFrame([(k, f"v{k}") for k in range(8)], "k long, v string")
    schema = "k long, v string, op string, seq long"
    changesets = [
        [(1, "a", "U", 1)],
        [(2, "b", "U", 2)],
        [(9, "new", "I", 3)],
        [(3, None, "D", 4)],
    ]
    in_dir = str(tmp_path / "changes")
    os.makedirs(in_dir)
    import glob as g

    for i, rows in enumerate(changesets):
        df = spark.createDataFrame(rows, schema)
        tmp = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(g.glob(tmp + "/part-*.parquet")[0], os.path.join(in_dir, f"c{i}.parquet"))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    snap_dir = str(tmp_path / "snap")
    final = run_cdc_stream(
        stream, snap, snap_dir, "k", str(tmp_path / "ckpt"), retain_versions=2
    )

    assert sorted(os.listdir(snap_dir)) == ["v2", "v3"]
    merged = spark.createDataFrame([r for c in changesets for r in c], schema)
    want = sorted((r["k"], r["v"]) for r in apply_changeset(snap, merged, key="k").collect())
    assert sorted((r["k"], r["v"]) for r in final.collect()) == want


def test_prune_versions_clamps_keep_and_sweeps_trash(tmp_path):
    """The retention helper keeps >=2 versions regardless of the asked
    keep (the strictly-below replay base must survive), and sweeps
    _gc_ leftovers from a crash mid-delete."""
    from crypto_etl_pipeline_spark.streaming.incremental import _prune_versions

    base = tmp_path / "snaps"
    for n in range(5):
        d = base / f"v{n}"
        d.mkdir(parents=True)
        (d / "part.parquet").write_text("x")
    stale = base / "_gc_v99"
    stale.mkdir()
    (stale / "junk").write_text("x")

    _prune_versions(str(base), keep=1)
    assert sorted(p.name for p in base.iterdir()) == ["v3", "v4"]


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_NETWORK") != "1",
    reason="live network test; set SPARK_GRAFT_NETWORK=1 to run",
)
def test_live_coingecko_fetch(spark):
    """Gated integration test for the real REST path (off by default —
    this sandbox has no egress). Asserts schema and row shape only;
    values are live market data."""
    from crypto_etl_pipeline_spark.sources.rest import coingecko_fetch, rest_source

    df = rest_source(spark, fetch=lambda: coingecko_fetch(per_page=5))
    rows = df.collect()
    assert len(rows) == 5
    assert "symbol" in df.columns and "current_price" in df.columns


def test_observe_metrics_match_result(spark):
    """df.observe: in-flight data-quality metrics collected during the
    SAME job that produces the result — no second scan. The observed
    row count and sum must equal what the result itself says."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    obs = Observation("quality")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null_values"),
    )
    agg = observed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()[0]
    m = obs.get
    assert m["n_rows"] == agg["n"]
    assert m["n_null_values"] == agg["nulls"]
    assert m["n_rows"] > 0


def _make_ppm(w, h, seed):
    """Valid binary PPM (P6) fixture with a comment line and seeded
    raster — library-free."""
    import random

    rng = random.Random(seed)
    raster = bytes(rng.randrange(256) for _ in range(w * h * 3))
    header = f"P6\n# fixture {seed}\n{w} {h}\n255\n".encode()
    return header + raster, raster


def _make_bmp(w, h, seed):
    """Valid 24bpp bottom-up BMP fixture (BITMAPINFOHEADER, padded
    rows, BGR order) — library-free. Returns (payload, rgb_rows) where
    rgb_rows is the top-down RGB raster the decoder must reproduce."""
    import random
    import struct

    rng = random.Random(seed)
    rgb = [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w)] for _ in range(h)]
    stride = (w * 3 + 3) // 4 * 4
    raster = b""
    for row in reversed(rgb):  # bottom-up
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + raster, rgb


def test_decode_image_real_parses_ppm_and_bmp(spark):
    """The REAL decode path (pure-Python PPM/BMP codecs — no Pillow
    needed, so this test always RUNS; round-4 VERDICT #5): true header
    dimensions come back through the same mapInPandas plumbing as the
    stub, with the shared payload checksum."""
    from crypto_etl_pipeline_spark.multimodal import binary as mm

    ppm, _ = _make_ppm(9, 4, seed=1)
    bmp, _ = _make_bmp(6, 3, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in mm.decode_image(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (9, 4)
    assert (rows[2]["width"], rows[2]["height"]) == (6, 3)
    assert rows[1]["checksum"] == sum(ppm) % 2_147_483_648
    assert rows[2]["n_bytes"] == len(bmp)


def test_decode_image_real_vs_stub_differential(spark):
    """Stub vs real on the SAME image payloads: identical schema,
    identical n_bytes/checksum (codec-independent contract), but the
    real codec returns the true header dimensions while the stub's are
    length-derived — the exact delta that makes the stub a stand-in
    and the real path a decoder."""
    from crypto_etl_pipeline_spark.multimodal import binary as mm

    ppm, _ = _make_ppm(31, 17, seed=3)
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, payload binary")
    real = mm.decode_image(df, codec="real").collect()[0]
    stub = mm.decode_image(df, codec="stub").collect()[0]
    assert real.asDict().keys() == stub.asDict().keys()
    assert (real["n_bytes"], real["checksum"]) == (stub["n_bytes"], stub["checksum"])
    assert (real["width"], real["height"]) == (31, 17)
    assert (stub["width"], stub["height"]) == (len(ppm) % 640 + 1, len(ppm) % 480 + 1)


def test_decode_pixels_reproduces_raster(spark):
    """Raster-level decode: the numpy pixel arrays must reproduce the
    generated rasters exactly — PPM byte-for-byte, BMP with the
    bottom-up row order and BGR->RGB swap undone."""
    import numpy as np

    from crypto_etl_pipeline_spark.multimodal import binary as mm

    ppm, raster = _make_ppm(5, 7, seed=4)
    px = mm.decode_pixels(ppm)
    assert px.shape == (7, 5, 3)
    assert px.tobytes() == raster

    bmp, rgb = _make_bmp(5, 3, seed=5)
    px = mm.decode_pixels(bmp)
    assert px.shape == (3, 5, 3)
    for y in range(3):
        for x in range(5):
            assert tuple(px[y, x]) == rgb[y][x], (y, x)


def test_decode_image_real_fails_loudly_on_garbage(spark):
    """A real pipeline must not invent dimensions for undecodable
    payloads: without Pillow, non-PPM/BMP bytes raise; codec='pil'
    raises RuntimeError when Pillow is absent (no silent stubbing)."""
    from crypto_etl_pipeline_spark.multimodal import binary as mm

    if mm.HAS_PIL:
        pytest.skip("Pillow present: garbage goes to PIL and raises there")
    df = spark.createDataFrame([(1, bytearray(b"abc"))], "doc_id long, payload binary")
    with pytest.raises(Exception):
        mm.decode_image(df, codec="real").collect()
    with pytest.raises(RuntimeError):
        mm.decode_image(df, codec="pil")


def test_decode_image_pil_parses_real_png(spark):
    """Optional-extra test: Pillow extends the real codec to compressed
    formats; runs only where Pillow exists (PPM/BMP coverage above is
    unconditional)."""
    from crypto_etl_pipeline_spark.multimodal import binary as mm

    if not mm.HAS_PIL:
        pytest.skip("Pillow not available in this environment")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = mm.decode_image(df, codec="pil").collect()[0]
    assert (row["width"], row["height"]) == (7, 5)


def test_ndjson_sink_two_phase_commit(spark, tmp_path):
    """Python DataSource writer: rows land atomically (manifest +
    promoted parts, no staging residue) and read back value-identical."""
    import json

    from crypto_etl_pipeline_spark.sources.ndjson_sink import NdjsonSinkDataSource

    spark.dataSource.register(NdjsonSinkDataSource)
    df = spark.createDataFrame(
        [(i, f"s{i}", i * 1.5) for i in range(100)], "id long, s string, v double"
    )
    out = str(tmp_path / "sink_out")
    os.makedirs(out)
    df.repartition(4).write.format("ndjson_sink").mode("append").option("path", out).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    assert not os.path.exists(os.path.join(out, "_staging"))
    parts = [e for e in os.listdir(out) if e.startswith("part-")]
    assert sorted(p["file"] for p in manifest["files"]) == sorted(parts)

    back = spark.read.schema("id long, s string, v double").json(
        os.path.join(out, "part-*.ndjson")
    )
    assert {(r["id"], r["s"], r["v"]) for r in back.collect()} == {
        (i, f"s{i}", i * 1.5) for i in range(100)
    }


def test_ndjson_sink_overwrite_replaces_previous_commit(spark, tmp_path):
    import json

    from crypto_etl_pipeline_spark.sources.ndjson_sink import NdjsonSinkDataSource

    spark.dataSource.register(NdjsonSinkDataSource)
    out = str(tmp_path / "sink_out2")
    os.makedirs(out)
    df1 = spark.createDataFrame([(1,), (2,)], "id long")
    df1.write.format("ndjson_sink").mode("append").option("path", out).save()
    df2 = spark.createDataFrame([(10,)], "id long")
    df2.write.format("ndjson_sink").mode("overwrite").option("path", out).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 1
    back = spark.read.schema("id long").json(os.path.join(out, "part-*.ndjson"))
    assert [r["id"] for r in back.collect()] == [10]


def test_ndjson_sink_append_accumulates_manifest(spark, tmp_path):
    """Two append jobs into the same directory: the manifest (readers'
    source of truth) must carry BOTH commits' files and row totals —
    a second append that rewrote the manifest with only its own files
    would silently orphan the first job's rows."""
    import json

    from crypto_etl_pipeline_spark.sources.ndjson_sink import NdjsonSinkDataSource

    spark.dataSource.register(NdjsonSinkDataSource)
    out = str(tmp_path / "sink_append2")
    os.makedirs(out)
    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.format(
        "ndjson_sink"
    ).mode("append").option("path", out).save()
    spark.createDataFrame([(10,), (11,), (12,)], "id long").coalesce(1).write.format(
        "ndjson_sink"
    ).mode("append").option("path", out).save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 5
    parts = {e for e in os.listdir(out) if e.startswith("part-")}
    assert {e["file"] for e in manifest["files"]} == parts
    back = spark.read.schema("id long").json(os.path.join(out, "part-*.ndjson"))
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 10, 11, 12]


def test_ndjson_stream_writer_manifests_and_replay_idempotence(spark, tmp_path):
    """writeStream into the custom sink: per-micro-batch manifests sum
    to the source row count, and re-running the SAME input with a fresh
    checkpoint (which replays batch 0) REPLACES batch-0 output instead
    of duplicating it."""
    import glob
    import json

    from crypto_etl_pipeline_spark.sources.ndjson_sink import NdjsonSinkDataSource

    spark.dataSource.register(NdjsonSinkDataSource)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for fi in range(2):
        _write_event_file(
            spark,
            os.path.join(in_dir, f"ev{fi}.parquet"),
            [(fi * 10 + i, 1000.0 + fi * 100 + i, 7, 1.0) for i in range(10)],
        )
    out = str(tmp_path / "out")
    os.makedirs(out)

    def drain(ckpt):
        stream = (
            spark.readStream.schema(
                "event_id long, ts long, user_id long, event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            stream.writeStream.format("ndjson_sink")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt1"))
    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST-*.json")))
    total = sum(json.load(open(m))["total_rows"] for m in manifests)
    assert total == 20
    assert len(manifests) == 2  # one per micro-batch (maxFilesPerTrigger=1)

    # fresh checkpoint => batch ids restart at 0; replayed batches must
    # REPLACE their previous output, keeping the manifest sum stable
    drain(str(tmp_path / "ckpt2"))
    manifests2 = sorted(glob.glob(os.path.join(out, "_MANIFEST-*.json")))
    total2 = sum(json.load(open(m))["total_rows"] for m in manifests2)
    assert total2 == 20
    listed = {
        e["file"] for m in manifests2 for e in json.load(open(m))["files"]
    }
    on_disk = {e for e in os.listdir(out) if e.startswith("batch-")}
    assert listed == on_disk  # no orphan parts from the replay
    # staged files from failed/speculative attempts must not accumulate
    # over a long-running stream — commit clears the staging dir
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Lakehouse schema evolution: files written before a column was
    added must read back as nulls under mergeSchema, with no rewrite of
    old files — the additive-evolution contract a 100 TB table relies
    on (rewriting history is not an option at that scale)."""
    base = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    v1.write.parquet(base + "/d=1")
    v2 = spark.createDataFrame(
        [(3, "c", 1.5), (4, "d", 2.5)], "id long, s string, score double"
    )
    v2.write.parquet(base + "/d=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "s", "score", "d"}
    rows = {r["id"]: (r["s"], r["score"]) for r in merged.collect()}
    assert rows[1] == ("a", None) and rows[4] == ("d", 2.5)
    # old files untouched: the narrow read of partition d=1 still works
    old = spark.read.parquet(base + "/d=1")
    assert old.columns == ["id", "s"]


def test_compact_parquet_preserves_rows_and_reduces_files(spark, tmp_path):
    import glob

    from crypto_etl_pipeline_spark.sources.sinks import compact_parquet

    out = str(tmp_path / "many_small")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(1000)], "id long, s string")
    df.repartition(32).write.parquet(out)
    before_files = len(glob.glob(os.path.join(out, "*.parquet")))
    assert before_files >= 16
    before_rows = {tuple(r) for r in spark.read.parquet(out).collect()}

    after_files = compact_parquet(spark, out, target_file_bytes=1 << 30)
    assert after_files == 1
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == before_rows


def test_compact_parquet_recovers_from_crash_states(spark, tmp_path):
    """Every crash window of the two-rename swap must be survivable by
    the next run: a stale __compacting dir (pre-swap crash), a stale
    __old next to a live dir (post-swap crash), and the worst case —
    path absent with the original parked at __old (crash BETWEEN the
    renames) — all recover without losing a row."""
    import shutil

    from crypto_etl_pipeline_spark.sources.sinks import compact_parquet

    out = str(tmp_path / "crashy")
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    df.repartition(8).write.parquet(out)
    rows = {r["id"] for r in spark.read.parquet(out).collect()}

    # pre-swap crash: partial tmp dir left behind
    os.makedirs(out + "__compacting")
    open(os.path.join(out + "__compacting", "garbage.parquet"), "w").write("x")
    assert compact_parquet(spark, out, target_file_bytes=1 << 30) == 1
    assert {r["id"] for r in spark.read.parquet(out).collect()} == rows
    assert not os.path.exists(out + "__compacting") and not os.path.exists(out + "__old")

    # post-swap crash: stale __old next to the live dir
    shutil.copytree(out, out + "__old")
    assert compact_parquet(spark, out, target_file_bytes=1 << 30) == 1
    assert {r["id"] for r in spark.read.parquet(out).collect()} == rows
    assert not os.path.exists(out + "__old")

    # mid-swap crash: live dir gone, original parked at __old
    os.rename(out, out + "__old")
    assert compact_parquet(spark, out, target_file_bytes=1 << 30) == 1
    assert {r["id"] for r in spark.read.parquet(out).collect()} == rows
    assert not os.path.exists(out + "__old")
