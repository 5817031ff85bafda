"""SparkSession factory tuned for the crawl engine.

Local mode is the test harness; the same confs are what we'd ship in
spark-defaults for a multi-executor cluster (AQE on, adaptive coalescing,
runtime bloom-filter joins for the seen anti-join, Arrow for pandas UDFs).

Cluster execution (north_rule: ``spark-submit --py-files`` at N and 4N
executors): set ``SPARK_GRAFT_MASTER`` (or pass ``master=``) to any Spark
master URL — ``yarn``, ``k8s://…``, ``spark://…`` — and the factory defers
to the cluster manager for parallelism and scratch dirs::

    spark-submit --master yarn --deploy-mode client \\
        --py-files heritrix_spark.zip --num-executors N \\
        your_crawl_driver.py

When launched via spark-submit, an existing session/master is respected
(``getOrCreate`` never overrides a configured master).  The /dev/shm
``spark.local.dir`` is applied only in local mode (single-box shuffle on
tmpfs); clusters keep their manager-provisioned local dirs, or set
``SPARK_GRAFT_LOCAL_DIR`` explicitly.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "heritrix_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master=None`` → ``$SPARK_GRAFT_MASTER`` if set (cluster mode), else
    ``local[cores]``.  ``cores=None`` → ``$SPARK_GRAFT_CPUS`` or all.
    ``shuffle_partitions`` defaults to the core count locally — on a real
    cluster size it to 2-3× total cores and let AQE coalesce.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cores}]"
    local = master.startswith("local")
    builder = (
        SparkSession.builder.master(master)
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
        # Engine arithmetic (hash-derived ints) relies on Java long semantics.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Static conf (default 100): the superstep loop compiles dozens of
        # distinct codegen stages per step; at 100 entries the janino
        # class cache thrashes and every step pays recompiles of the same
        # sources.  Sized to hold the whole loop's working set.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    # Shuffle/spill on tmpfs in LOCAL mode only (single-box shuffle writes
    # otherwise serialize on disk bandwidth and flatten core scaling);
    # clusters keep manager-provisioned dirs unless overridden.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or (
        ("/dev/shm/spark-local" if os.path.isdir("/dev/shm")
         else "/tmp/spark-local") if local else None)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # Generic conf passthrough for experiments / site tuning:
    #   SPARK_GRAFT_CONF='spark.io.compression.codec=zstd;spark.foo=bar'
    # Merged into one dict (env first, programmatic callers win) so the
    # local-mode GC default below can MERGE with — not be replaced by —
    # a user-supplied spark.driver.extraJavaOptions.
    merged: dict[str, str] = {}
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for item in filter(None, (s.strip() for s in env_conf.split(";"))):
        k, _, v = item.partition("=")
        if k and v:
            merged[k.strip()] = v.strip()
    if extra_conf:
        merged.update(extra_conf)
    if local:
        # GC for the single-JVM batch driver, re-measured every round on
        # the current engine: round 3 (regex-heavy candidate pipeline)
        # had ParallelGC +2% at 8 cores; the round-4 engine's hot path
        # is allocation-rate-dominated (guarded canonicalizer — less CPU
        # per byte of string churn) and ParallelGC's stop-the-world
        # collections became the 16-core plateau — G1 measured +17% at
        # 16 cores (17.4k vs 14.9k URLs/s) and -2% (noise) at 4 cores,
        # so G1 is the local default again.  Local mode only — cluster
        # executor JVMs are tuned by the site's spark-defaults.  Applied
        # only when user extraJavaOptions select no collector: HotSpot
        # refuses two GC selections outright ("Multiple garbage
        # collectors selected").
        user_opts = merged.get("spark.driver.extraJavaOptions", "")
        if not re.search(r"-XX:\+Use\w*GC\b", user_opts):
            merged["spark.driver.extraJavaOptions"] = (
                "-XX:+UseG1GC " + user_opts).strip()
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
