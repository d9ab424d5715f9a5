"""Non-parquet input adapters (SURVEY.md §2.1).

Reference surface: CSVReader.subscribe (csp/adapters/csv.py:29-113),
DBReader.subscribe (csp/adapters/db.py:36-440), RecordBatchPull
(csp/adapters/arrow.py:59-90), KafkaAdapterManager.subscribe
(csp/adapters/kafka.py:39-191). Each reference adapter replays a
timestamped source into the engine ordered by its time column; our
analog reads the source with the native Spark connector and adapts it
into the tick encoding (ordering is carried by (ts, seq), not by
replay — SURVEY.md §2.8).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.ticks import TickStream


def _window(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) <= F.lit(end))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    ts_col: str,
    value_col: str,
    schema: str | None = None,
    key_col: str | None = None,
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    header: bool = True,
    **options: Any,
) -> TickStream:
    """CSVReader.subscribe parity (csp/adapters/csv.py:29-113): CSV
    replay with explicit schema (inferSchema is a full extra pass —
    avoid at scale) and start/end window pushed into the scan."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = _window(reader.csv(path), ts_col, start, end)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    num_partitions: int = 8,
    **options: Any,
) -> TickStream:
    """DBReader.subscribe parity (csp/adapters/db.py:36-440) on
    spark.read.jdbc. Partitioned reads on the time column so a large
    table scan parallelizes; requires a JDBC driver on the classpath
    (none is shipped in this container — structural parity only)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if start is not None and end is not None:
        # partition the scan along the replay window
        reader = (
            reader.option("partitionColumn", ts_col)
            .option("lowerBound", start.isoformat(sep=" "))
            .option("upperBound", end.isoformat(sep=" "))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = _window(reader.load(), ts_col, start, end)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)


def from_arrow(
    spark: SparkSession,
    data: Any,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
) -> TickStream:
    """RecordBatchPullInputAdapter parity (csp/adapters/arrow.py:59-90):
    replay an in-memory pyarrow Table / list of RecordBatches."""
    import pyarrow as pa

    if isinstance(data, list):
        data = pa.Table.from_batches(data)
    df = spark.createDataFrame(data)
    return TickStream.from_table(df, ts_col=ts_col, value_col=value_col, key_col=key_col)
