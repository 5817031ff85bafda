"""SparkSession factory tuned for the crawl engine.

Local mode is the test harness; the same confs are what we'd ship in
spark-defaults for a multi-executor cluster (AQE on, adaptive coalescing,
runtime bloom-filter joins for the seen anti-join, Arrow for pandas UDFs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "heritrix_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``.  ``shuffle_partitions`` defaults to the
    core count — on a real cluster you'd size this to 2-3× total cores and
    let AQE coalesce; locally matching cores avoids tiny-partition overhead.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Shuffle/spill on tmpfs: local-mode shuffle writes otherwise
        # serialize on disk bandwidth and flatten core scaling.
        .config("spark.local.dir",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm")
                else "/tmp/spark-local")
        # Engine arithmetic (hash-derived ints) relies on Java long semantics.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
