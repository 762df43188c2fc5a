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


class RetryableHTTPError(Exception):
    """HTTP 429 (rate limit) or 5xx — transient by contract, retried."""


def _http_get_json(url: str, params: dict[str, Any], timeout: int) -> list[dict]:
    """One GET, classifying failures: 429/5xx raise RetryableHTTPError,
    other HTTP errors raise requests' HTTPError (permanent)."""
    import requests

    r = requests.get(url, params=params, timeout=timeout)
    if r.status_code == 429 or r.status_code >= 500:
        raise RetryableHTTPError(f"HTTP {r.status_code}")
    r.raise_for_status()
    return r.json()


def coingecko_fetch_with_retry(
    timeout: int = 30,
    params: dict[str, Any] | None = None,
    max_retries: int = 4,
    base_delay: float = 1.0,
    max_delay: float = 30.0,
    sleep: Callable[[float], None] | None = None,
    get: Callable[[], list[dict]] | None = None,
) -> list[dict]:
    """:func:`coingecko_fetch` with bounded exponential backoff.

    The free CoinGecko tier rate-limits aggressively (429s); the
    reference's prose describes waiting out the limit (README rate-limit
    note) but its code is a bare GET. This wrapper retries TRANSIENT
    failures — HTTP 429/5xx and network-level errors (timeouts,
    connection resets: OSError subclasses, which covers requests'
    ConnectionError/Timeout) — with delays ``base_delay * 2^attempt``
    capped at ``max_delay``. Permanent HTTP errors (4xx other than 429)
    and parse errors fail immediately. On exhaustion or permanent
    failure it returns ``[]``, preserving the reference's
    empty-table-on-error contract (crypto_etl_pipeline.py:77-79) so the
    downstream empty-guard behaves identically.

    ``sleep`` and ``get`` are injectable for deterministic tests (the
    mockable-clock requirement); defaults are ``time.sleep`` and a real
    GET against the public API.
    """
    import time

    do_sleep = sleep if sleep is not None else time.sleep
    do_get = get if get is not None else (
        lambda: _http_get_json(COINGECKO_URL, params or DEFAULT_PARAMS, timeout)
    )
    for attempt in range(max_retries + 1):
        try:
            return do_get()
        except (RetryableHTTPError, OSError):
            if attempt == max_retries:
                return []
            do_sleep(min(base_delay * (2**attempt), max_delay))
        except Exception:
            return []
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
