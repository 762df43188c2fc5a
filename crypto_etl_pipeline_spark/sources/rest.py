"""REST JSON source (SURVEY.md §2.1 S1) — CoinGecko /coins/markets.

The fetch is driver-side (one page of 100 rows at reference scale —
crypto_etl_pipeline.py:43-79); rows land in an explicit-schema
DataFrame. At scale the same shape fans out: fetch page URLs driver-
side, then ``spark.read.schema(s).json(paths)`` over the saved pages,
or a Spark 4 Python DataSource for true pagination pushdown — the
*table contract* (API_SCHEMA) stays identical.

Error semantics match the reference: any fetch failure yields an
EMPTY table (crypto_etl_pipeline.py:77-79 returns an empty frame),
and the pipeline guard turns empty into ValueError
(crypto_etl_pipeline.py:89-92).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

COINGECKO_URL = "https://api.coingecko.com/api/v3/coins/markets"

# Projection of the ~30 API fields to the 7 the pipeline keeps
# (crypto_etl_pipeline.py:64-74; data_dictionary.txt:28-34).
API_FIELDS = (
    "symbol",
    "current_price",
    "price_change_percentage_24h",
    "market_cap",
    "total_volume",
    "high_24h",
    "low_24h",
)

API_SCHEMA = StructType(
    [StructField("symbol", StringType(), nullable=True)]
    + [StructField(f, DoubleType(), nullable=True) for f in API_FIELDS[1:]]
)

DEFAULT_PARAMS = {
    "vs_currency": "usd",
    "order": "market_cap_desc",
    "per_page": 100,
    "page": 1,
    "sparkline": False,
}


def coingecko_fetch(timeout: int = 30, params: dict[str, Any] | None = None) -> list[dict]:
    """Fetch one page of market rows; [] on any failure (S1 semantics)."""
    try:
        import requests

        r = requests.get(COINGECKO_URL, params=params or DEFAULT_PARAMS, timeout=timeout)
        r.raise_for_status()
        return r.json()
    except Exception:
        return []


def rows_to_dataframe(
    spark: SparkSession, rows: Sequence[dict], schema: StructType = API_SCHEMA
) -> DataFrame:
    """Project fetched JSON objects onto the API schema.

    Empty/failed fetch -> empty DataFrame with the same schema, so
    downstream guards and writers behave identically.
    """
    projected = [
        tuple(
            (float(row[f.name]) if f.name != "symbol" else str(row[f.name]))
            if row.get(f.name) is not None
            else None
            for f in schema.fields
        )
        for row in rows
    ]
    return spark.createDataFrame(projected, schema)


def rest_source(
    spark: SparkSession,
    fetch: Callable[[], Sequence[dict]] = coingecko_fetch,
    schema: StructType = API_SCHEMA,
) -> DataFrame:
    """S1 composed: fetch() driver-side -> explicit-schema DataFrame."""
    return rows_to_dataframe(spark, fetch(), schema)
