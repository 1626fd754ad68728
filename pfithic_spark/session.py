"""SparkSession construction tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~= cores (not the 200 default), AQE on for runtime
re-planning/skew handling, Arrow enabled for the pandas-UDF kernels,
session timezone pinned to UTC so timestamp math is deterministic and
matches the (UTC-naive) DuckDB oracle.

``spark.sql.legacy.parquet.nanosAsLong`` is required to read the
``events`` table (parquet TIMESTAMP(NANOS) — Spark has no nanosecond
timestamp type); it is a runtime SQL conf, so :func:`ensure_engine_confs`
can also be applied to an externally provided session (the driver's).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are safe (and required) to set on any session at runtime.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine depends on.

    Idempotent; call at the top of every externally-invoked query so the
    engine works against a session it did not build.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf may be locked down on a managed cluster; the engine
            # still works if the session was built with compatible values.
            pass
    return spark


def get_spark(
    app: str = "pfithic-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_engine_confs(spark)
