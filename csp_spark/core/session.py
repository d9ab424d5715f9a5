"""SparkSession factory tuned for the csp_spark engine.

Defaults target local[N] testing but the config set is what we would
ship on a 1000-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), Arrow for the few pandas exchanges,
UTC session timezone (the reference normalizes all timestamps to naive
UTC — csp/impl/wiring/runtime.py:27-33).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # The reference engine is strictly ordered in naive-UTC nanoseconds;
    # Spark timestamps are microsecond UTC — we standardize on UTC.
    "spark.sql.session.timeZone": "UTC",
    # csp semantics are non-ANSI: float ops yield NaN/Inf rather than
    # raising (e.g. corr/var over a 1-point window must gate to NaN, not
    # throw DIVIDE_BY_ZERO inside the window aggregate).
    "spark.sql.ansi.enabled": "false",
    # AQE: runtime shuffle-partition coalescing + skew-join handling are
    # load-bearing at 100 TB (skewed keys in groupBy/join).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for applyInPandas/pandas_udf paths (EMA family, gate).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    # Dim tables (region/nation/customer/supplier/part at our SFs) should
    # broadcast; on a real cluster this threshold is tuned per workload.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Parquet vectorized reader + pushdown are defaults but we pin them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # local[N] runs executors inside the driver JVM, whose default heap
    # is 1g — far too small for 32 concurrent tasks with array-heavy
    # rows (shingle sets, signatures). On a real cluster this maps to
    # spark.executor.memory instead. Only effective at JVM launch.
    "spark.driver.memory": "32g",
    "spark.driver.maxResultSize": "4g",
}


def get_spark(
    app_name: str = "csp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    **extra: str,
) -> SparkSession:
    """Build (or fetch) the SparkSession used by the engine.

    ``SPARK_GRAFT_CPUS`` selects local parallelism (driver contract);
    ``shuffle_partitions`` defaults to 32 locally — on a cluster you set
    it near total cores (or rely on AQE coalescing from a higher value).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("CSP_SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
