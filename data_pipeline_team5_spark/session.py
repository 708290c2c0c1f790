"""SparkSession factory.

The reference delegates all execution to Redshift (SURVEY.md §4); here Catalyst
plays that role, so the session is where scale posture is set: AQE for runtime
re-planning (skew joins, partition coalescing), a shuffle-partition count sized
to the test machine but overridable for clusters, UTC timestamps so results are
timezone-stable across engines, and Arrow for any Python-boundary exchange.

At 100 TB these same settings hold: AQE re-splits skewed shuffle partitions,
``spark.sql.files.maxPartitionBytes`` keeps scan tasks bounded, and broadcast
joins are decided per-join (we hint explicitly where a dimension is known
small — see operators/joins.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data_pipeline_team5_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS]``; on a real cluster pass
    ``master=None`` with a pre-set ``spark.master`` or submit via spark-submit
    and this merely applies the engine's SQL posture on the existing session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = {
        # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Sized for the test box; at cluster scale set ~2-3x total cores.
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        # Deterministic cross-engine timestamps (DuckDB oracle is UTC-naive).
        "spark.sql.session.timeZone": "UTC",
        # Arrow for pandas_udf / mapInPandas / toPandas exchange.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Bounded scan tasks at any input size.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Local mode: quiet UI off, generous driver heap is set by launcher.
        "spark.ui.enabled": "false",
        "spark.sql.parquet.compression.codec": "snappy",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
