"""End-to-end pipeline compositions (SURVEY.md §3 EP2/EP3)."""

from crypto_etl_pipeline_spark.plans.api import classify_api_table  # noqa: F401
from crypto_etl_pipeline_spark.plans.historical import clean_historical  # noqa: F401
