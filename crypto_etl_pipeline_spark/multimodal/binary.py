"""Multimodal columns: opaque binary payloads + typed metadata (§2.13).

Design: media travels as a ``BinaryType`` payload column next to a
``StructType`` metadata column (mime, width, height, duration_ms, uri)
— the layout ``spark.read.format("binaryFile")`` produces, and the one
a 100 TB corpus would use (payloads in parquet binary columns or
object-store URIs, metadata queryable without touching bytes).

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators: the Spark-side plumbing (schemas, batch
iteration, column pass-through, partition preservation) is real and
tested; the codec call inside is a STUB — image/audio libraries are
not available in this environment, so decode is a deterministic fake
parser over the payload bytes, and the library call site is marked.
Swapping the stub for PIL/libav changes no Spark code.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("uri", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def attach_fake_payloads(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads for testing the multimodal plumbing.

    payload = UTF-8 bytes of the text; metadata dimensions derive from
    the byte length so every downstream assertion is reproducible and
    SQL-expressible (the DuckDB oracle mirrors the arithmetic).
    """
    # Round-robin spread BEFORE attaching payloads: the downstream
    # decode/feature/frame operators are partition-preserving Arrow
    # stages (their documented contract), so a compact source that
    # arrives in one parquet split would otherwise pin the CPU-bound
    # codec work to a single core — the same hazard class as AQE
    # coalescing Python grouped stages (operators/timeseries.ewma).
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (n % 640 + 1).cast("int").alias("width"),
            (n % 480 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.concat(F.lit("mem://doc/"), F.col(id_col).cast("string")).alias("uri"),
        ).alias("meta"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


# Capability probe: use the real codec when the environment provides
# it, the deterministic stub otherwise. The sandbox has no PIL, so the
# stub is the tested default; an environment with Pillow flips this
# flag at import time and decode_image() parses real image bytes with
# the SAME mapInPandas plumbing (schema, batching, partitioning).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB codec (sandbox default; see HAS_PIL probe above).

    Deterministic fake: dimensions from byte length, checksum = sum of
    bytes mod 2^31 (cheap, reproducible, oracle-expressible).
    """
    n = len(payload)
    return n % 640 + 1, n % 480 + 1, sum(payload) % 2_147_483_648


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Real codec path, exercised only when HAS_PIL (flag-gated test).

    Same return contract as the stub: (width, height, checksum-of-
    payload-bytes) — so downstream schemas and oracles are unchanged.
    """
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        w, h = im.size
    return w, h, sum(payload) % 2_147_483_648


def decode_image_stub(media: DataFrame) -> DataFrame:
    """'Decode' payloads via Arrow-batched mapInPandas.

    Batch shape: the function receives an iterator of pandas DataFrames
    (one per Arrow batch, whole partition streamed), returns the decoded
    rows — constant memory per batch, no driver involvement, partition
    count preserved.
    """

    return _decode_image_with(media, _fake_decode)


def decode_image(media: DataFrame, use_pil: bool | None = None) -> DataFrame:
    """Decode payloads with the best available codec.

    ``use_pil=None`` auto-selects: the real PIL parser when the
    environment provides Pillow (HAS_PIL), the deterministic stub
    otherwise. Either way the Spark plan is identical — only the
    per-batch Python callable differs."""
    if use_pil is None:
        use_pil = HAS_PIL
    if use_pil and not HAS_PIL:
        raise RuntimeError("use_pil=True but Pillow is not importable")
    return _decode_image_with(media, _pil_decode if use_pil else _fake_decode)


def _decode_image_with(media: DataFrame, codec) -> DataFrame:
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [codec(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "checksum": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", StructType([
            StructField("brightness", LongType()),
            StructField("n_bytes", LongType()),
        ])),
    ]
)


def extract_features_stub(media: DataFrame) -> DataFrame:
    """STUB feature extractor over payload bytes (mapInPandas).

    Real implementation would run a vision model over decoded pixels;
    the fake computes mean byte value ('brightness') — deterministic
    and oracle-expressible.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                rows.append((doc_id, {"brightness": sum(b) // max(len(b), 1), "n_bytes": len(b)}))
            yield pd.DataFrame({"doc_id": [r[0] for r in rows], "feature": [r[1] for r in rows]})

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


def sample_frames_stub(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """STUB frame sampler: one 'frame' row per every_n_bytes of payload.

    Demonstrates the 1->N row fan-out shape (video -> frames) through
    mapInPandas; a real sampler would emit decoded frame payloads.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("offset", LongType()),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, offs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(len(bytes(p)) // every_n_bytes, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    nos.append(i)
                    offs.append(i * every_n_bytes)
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "offset": offs})

    return media.mapInPandas(frames, schema=schema)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
    ]
)


def resize_image_stub(media: DataFrame, max_side: int = 224) -> DataFrame:
    """STUB resize: aspect-preserving target dimensions via exact
    integer arithmetic (``dim * max_side // longest_side``), computed
    over the metadata only — the codec call that would produce resized
    pixels is the marked stub. Upscaling is avoided (min with source).
    Pure-expression: at 100 TB this plans as a metadata-only projection
    that never touches payload bytes.
    """
    w = F.col("meta.width")
    h = F.col("meta.height")
    longest = F.greatest(w, h)
    return media.select(
        "doc_id",
        w.alias("src_w"),
        h.alias("src_h"),
        F.least(w, (w * max_side).cast("int") / longest).cast("int").alias("out_w"),
        F.least(h, (h * max_side).cast("int") / longest).cast("int").alias("out_h"),
    )


def resample_audio_stub(
    media: DataFrame, src_rate: int = 44_100, dst_rate: int = 16_000
) -> DataFrame:
    """STUB audio resample: payload bytes stand in for PCM samples; the
    output sample count and duration follow the exact integer
    resampling arithmetic (``n * dst // src``). A real implementation
    would run the polyphase filter inside mapInPandas — the arithmetic
    contract checked here is what any implementation must satisfy."""
    n = F.octet_length(F.col("payload")).cast("long")
    out = (n * dst_rate).cast("long") / src_rate
    return media.select(
        "doc_id",
        n.alias("src_samples"),
        out.cast("long").alias("out_samples"),
        ((out.cast("long") * 1000) / dst_rate).cast("long").alias("duration_ms"),
    )
