from crypto_etl_pipeline_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
)
