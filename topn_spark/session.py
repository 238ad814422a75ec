"""SparkSession factory pinning the engine's environment contract.

The contract (SURVEY.md §2.5 environment notes):

- session timezone UTC (cross-engine timestamp determinism),
- ``spark.sql.legacy.parquet.nanosAsLong=true`` so the ``events``
  table's nanosecond timestamps are readable (Spark 4 otherwise
  rejects INT64 TIMESTAMP(NANOS) parquet columns outright),
- AQE on (runtime re-plan: dynamic coalescing, skew-join splitting,
  broadcast demotion) — this is the 100 TB safety net,
- Arrow enabled for the Pandas-UDF extension operators.

Shuffle partitions default to the local core count for tests/bench; on
a real cluster the caller should size this to ~2-3x total executor
cores (or rely on AQE coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "topn_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    In local mode there is a single JVM; ``driver_memory`` is the only
    memory knob. On a cluster, pass ``master=None`` and let
    spark-submit supply master/memory — every other conf here is
    cluster-safe.
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", driver_memory
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
