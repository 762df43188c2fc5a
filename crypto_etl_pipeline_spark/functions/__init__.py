from crypto_etl_pipeline_spark.functions.cleaning import (  # noqa: F401
    coerce_double,
    normalize_headers,
    parse_grouped_number,
    parse_money,
    parse_percent,
    parse_unit_suffix,
)
from crypto_etl_pipeline_spark.functions.classify import (  # noqa: F401
    TREND_LABELS,
    classify_trend,
)
