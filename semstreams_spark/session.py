"""SparkSession factory tuned for this engine.

Local mode for tests/bench; the same config block is what we'd ship to a
real cluster via spark-submit (AQE on, skew-join on, Arrow on, RocksDB
state store for streaming state).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semstreams_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to cores (local mode rule of thumb).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n_cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n_cores, 8)

    # sandboxed hosts often have slow reverse-DNS: without this every
    # stage pays a multi-second hostname-resolution tax
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    os.environ.setdefault("SPARK_LOCAL_HOSTNAME", "localhost")

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # openCost only lowers the SPLIT-SIZE FLOOR: locally it lets a
        # 12 MB CPU-heavy transcript file fan out across all cores
        # (split = max(openCost, bytes/cores)); at cluster scale
        # bytes/cores >> this so splits stay at maxPartitionBytes —
        # scale-neutral, unlike shrinking maxPartitionBytes itself
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # write-heavy state tuning: maintaining the exact numRowsTotal
        # metric costs RocksDB a read-before-every-put; dropping it cut
        # steady-state trigger latency ~25% and removed most of the
        # fresh-query commit spike (measured, BASELINE §G). Only the
        # progress-metric loses precision — semantics are unaffected.
        .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
