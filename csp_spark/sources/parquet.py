"""Parquet replay source — ParquetReader parity (SURVEY.md §2.1).

Reference: csp/adapters/parquet.py:109-330 (time_column replay, symbol
filtering, start/end bounds) over a C++ Arrow reader. Spark-first:
``spark.read.parquet`` IS the native equivalent — vectorized scan,
predicate pushdown, partition pruning — so this module is thin: schema
quirks + the TickStream adapter.

Nanosecond timestamps: csp is ns-resolution (cpp/csp/core/Time.h);
Spark is µs. Parquet files with TIMESTAMP(NANOS) columns (e.g. the
driver's events.ts) are rejected by Spark's reader unless
``spark.sql.legacy.parquet.nanosAsLong=true``; :func:`read_table`
detects such columns via the parquet footer, flips the conf, and
converts ns-longs to µs timestamps (documented precision delta).
"""

from __future__ import annotations

import datetime as _dt
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.ticks import TickStream

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nano_ts_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, transparently handling TIMESTAMP(NANOS)
    columns (returned as µs TimestampType)."""
    nanos = _nano_ts_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
        for c in nanos:
            # integer div, not `/` (double division rounds the µs value
            # for ns-epochs > 2^53; DuckDB and the reference truncate)
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
        return df
    finally:
        if prev is not None:
            spark.conf.set(_NANOS_CONF, prev)
        # leave the conf set if it was unset before: the lazy plan reads
        # the file at action time and still needs it


def subscribe(
    spark: SparkSession,
    path: str,
    time_column: str,
    value_column: str,
    symbol_column: str | None = None,
    symbol: str | Sequence[str] | None = None,
    start: _dt.datetime | None = None,
    end: _dt.datetime | None = None,
    seq_column: str | None = None,
) -> TickStream:
    """ParquetReader.subscribe parity (csp/adapters/parquet.py:109-180):
    replay one column as a tick stream ordered by time_column, with
    optional symbol filter and [start, end] bounds.

    Filters are plain Catalyst predicates → pushed to the parquet scan
    (PushedFilters in .explain), so a symbol/time slice reads only the
    matching row groups — this is where Spark beats the reference's
    single-process reader at scale.
    """
    df = read_table(spark, path)
    if symbol is not None and symbol_column is not None:
        if isinstance(symbol, str):
            df = df.filter(F.col(symbol_column) == symbol)
        else:
            df = df.filter(F.col(symbol_column).isin(list(symbol)))
    if start is not None:
        df = df.filter(F.col(time_column) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(time_column) <= F.lit(end))
    return TickStream.from_table(
        df,
        ts_col=time_column,
        value_col=value_column,
        key_col=symbol_column,
        seq_col=seq_column,
    )
