"""SparkSession factory.

One place to encode the 100 TB-scale posture (SURVEY.md §2.13, §4):
AQE on (runtime partition coalescing + skew-join splitting), Arrow on
(fast pandas/Python interchange for the few Pandas-UDF operators),
sane shuffle parallelism, and the parquet nanosecond-timestamp
compatibility flag needed for the driver's ``events`` table
(TIMESTAMP(NANOS) is read as LongType and converted by the loader).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crypto-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Config rationale (each scales past local mode):

    - ``spark.sql.adaptive.enabled`` + coalescePartitions + skewJoin:
      runtime re-planning; on a 1000-executor cluster this coalesces
      small post-shuffle partitions and splits skewed join keys.
    - ``spark.sql.autoBroadcastJoinThreshold``: 64 MB — dimension
      tables (region/nation/supplier/part at any SF that matters)
      broadcast instead of shuffling the fact table.
    - ``spark.sql.execution.arrow.pyspark.enabled``: Arrow batches for
      pandas_udf / applyInPandas / mapInPandas paths.
    - ``spark.sql.legacy.parquet.nanosAsLong``: the driver testdata's
      ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 refuses
      by default; read it as long ns-since-epoch (loader converts).
    - ``spark.sql.files.maxPartitionBytes``: 128 MB split granularity
      so a 100 TB scan yields ~800k well-sized tasks, not fewer huge
      ones.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
