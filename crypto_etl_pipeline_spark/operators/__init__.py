from crypto_etl_pipeline_spark.operators import dedup, profiling, similarity, stats, textops  # noqa: F401
