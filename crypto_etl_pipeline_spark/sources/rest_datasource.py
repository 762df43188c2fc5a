"""Spark 4 Python DataSource for the paginated REST market source.

This is the at-scale form of S1 (SURVEY.md §2.1): instead of one
driver-side fetch, the source exposes pagination to Spark — one
InputPartition per page, fetched IN PARALLEL on executors, with the
page size/count pushed down as reader options. Usage:

    spark.dataSource.register(MarketRestDataSource)
    df = (spark.read.format("market_rest")
          .option("pages", 4).option("per_page", 100)
          .option("transport", "mock")          # or "http" off-airgap
          .load())

The ``transport`` option selects the fetch implementation; "mock"
generates deterministic synthetic pages (used by tests and this
offline environment), "http" performs the real CoinGecko GET per page
(requests must be importable on executors). Schema is the fixed
7-column API contract, so downstream pipelines are transport-agnostic.

Rate limiting at scale: page partitions make the request budget
explicit — cap parallelism with ``spark.conf`` task scheduling or an
option-driven page count rather than hammering the API from every
core.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from crypto_etl_pipeline_spark.sources.rest import API_SCHEMA, COINGECKO_URL


class _PagePartition(InputPartition):
    def __init__(self, page: int, per_page: int, transport: str):
        self.page = page
        self.per_page = per_page
        self.transport = transport


def _mock_page(page: int, per_page: int) -> list[dict]:
    """Deterministic synthetic market rows (page-stable, seed-free)."""
    base = (page - 1) * per_page
    rows = []
    for i in range(per_page):
        rank = base + i + 1
        price = round(100000.0 / rank, 4)
        rows.append(
            {
                "symbol": f"coin{rank}",
                "current_price": price,
                "price_change_percentage_24h": round(((rank * 7919) % 2000 - 1000) / 100.0, 2),
                "market_cap": round(price * 1e6, 2),
                "total_volume": round(price * 2.5e4, 2),
                "high_24h": round(price * 1.05, 4),
                "low_24h": round(price * 0.95, 4),
            }
        )
    return rows


def _http_page(page: int, per_page: int) -> list[dict]:
    import requests

    r = requests.get(
        COINGECKO_URL,
        params={
            "vs_currency": "usd",
            "order": "market_cap_desc",
            "per_page": per_page,
            "page": page,
            "sparkline": False,
        },
        timeout=30,
    )
    r.raise_for_status()
    return r.json()


class _MarketRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.pages = int(options.get("pages", 1))
        self.per_page = int(options.get("per_page", 100))
        self.transport = options.get("transport", "mock")

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PagePartition(p, self.per_page, self.transport)
            for p in range(1, self.pages + 1)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetch = _mock_page if partition.transport == "mock" else _http_page
        # Null discipline mirrors rows_to_dataframe: a missing or null
        # field — INCLUDING symbol — yields None, never the string
        # "None" (real API payloads can omit/null any field).
        for row in fetch(partition.page, partition.per_page):
            yield tuple(
                (None if row.get(f.name) is None else
                 (str(row[f.name]) if f.name == "symbol" else float(row[f.name])))
                for f in self.schema_.fields
            )


class MarketRestDataSource(DataSource):
    """spark.read.format("market_rest") — paginated market-data source."""

    @classmethod
    def name(cls) -> str:
        return "market_rest"

    def schema(self) -> StructType:
        return API_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _MarketRestReader(schema, self.options)
