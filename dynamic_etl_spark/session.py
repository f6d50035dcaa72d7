"""SparkSession factory.

Centralizes the configuration every entry point (tests, bench, driver
contract) needs:

- AQE on (runtime join-strategy switch, partition coalescing, skew-join
  handling) — at 100 TB the static plan is never right; AQE re-plans from
  actual shuffle statistics.
- shuffle partitions sized to the local core count (overridable); on a real
  cluster this should be ~2-3x total executor cores — AQE coalesces down.
- Arrow on for the few Pandas-UDF operators (multimodal decode).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive UTC) and are cluster-location-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "dynamic-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores ts as Parquet TIMESTAMP(NANOS), which Spark
        # has no native type for; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # getOrCreate silently ignores builder configs when a session already
    # exists in the process. The runtime-settable invariants (UTC timezone is
    # an oracle-parity requirement; shuffle sizing matters for plan shape)
    # are re-applied via conf.set, which works post-creation.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    spark.sparkContext.setLogLevel("WARN")
    return spark
