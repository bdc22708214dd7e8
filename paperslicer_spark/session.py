"""SparkSession factory with scale-appropriate defaults.

These settings are the sandbox expression of the 100 TB design
(SURVEY.md §4): AQE on (runtime re-plan + skew-join splitting),
bounded Arrow batches (payloads are multi-KB strings, so record-count
caps bound Python-worker memory), and shuffle partitions sized to the
local core count (on a real cluster: 2-3× total executor cores, or
leave to AQE's ``advisoryPartitionSizeInBytes``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # local[32] on a 128 GiB box: the 1g JVM default GC-thrashes under
    # 32 executor threads (observed GCLocker retry warnings); size the
    # single local JVM like a real executor fleet would be sized
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
    "spark.driver.maxResultSize": "8g",
    # RAM-backed shuffle dir: this sandbox's VM disk makes shuffle I/O
    # the dominant noise source (measured ~3×); on a real cluster this
    # is the executors' local NVMe
    "spark.local.dir": os.environ.get("SPARK_LOCAL_DIRS",
                                      "/dev/shm/spark-local"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # multi-KB text payloads: cap rows per Arrow batch to bound worker memory
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
    "spark.sql.session.timeZone": "UTC",
    # generous broadcast threshold: all our dimension tables are tiny
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(app_name: str = "paperslicer_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_confs: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is None:
        try:
            n = int(master.split("[", 1)[1].rstrip("]").replace("*", "0")) or os.cpu_count()
        except (IndexError, ValueError):
            n = os.cpu_count() or 8
        shuffle_partitions = max(2 * n, 8)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
