"""Realtime sources (SURVEY.md §2.1 realtime rows; Execution-Modes.md).

The reference runs the same graph in simulation (historical replay) or
realtime (adapter threads pushing events) — Execution-Modes.md:1-39.
Our engine mirrors that: the batch tick table and these streaming
sources share the tick schema (key, ts, seq, value), so the same
operator pipeline compiles against either.

- ``rate_ticks``  — csp.timer in realtime (TimerInputAdapter.h): Spark
  rate source at 1/interval rows/sec.
- ``file_ticks``  — replay/tail a directory of parquet/csv drops; the
  test harness uses this (deterministic, no broker needed).
- ``kafka_ticks`` — KafkaAdapterManager.subscribe
  (csp/adapters/kafka.py:39-191): readStream kafka + JSON decode.
  Requires a broker + the kafka connector jar; structural parity.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE


def rate_ticks(
    spark: SparkSession,
    interval: _dt.timedelta,
    key: str = GLOBAL_KEY,
) -> DataFrame:
    """Periodic ticks at wall-clock rate (csp.timer realtime semantics,
    allow_deviation implied — the rate source emits on its own clock).
    Value is the tick index (csp.timer emits a constant; map over this
    stream for that)."""
    rows_per_sec = max(1.0 / interval.total_seconds(), 1e-6)
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )
    return raw.select(
        F.lit(key).alias(KEY),
        F.col("timestamp").alias(TS),
        F.lit(0).cast("long").alias(SEQ),
        F.col("value").alias(VALUE),
    )


def file_ticks(
    spark: SparkSession,
    path: str,
    schema: str,
    ts_col: str,
    value_col: str,
    key_col: str | None = None,
    seq_col: str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream a landing directory into the tick schema. With
    ``max_files_per_trigger=1`` each dropped file becomes one
    microbatch — the deterministic stand-in for an adapter pushing
    batches of events (GenericPushAdapter,
    csp/impl/genericpushadapter.py:19-60)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(path)
    return raw.select(
        (F.col(key_col) if key_col else F.lit(GLOBAL_KEY)).cast("string").alias(KEY),
        F.col(ts_col).cast("timestamp").alias(TS),
        (F.col(seq_col).cast("long") if seq_col else F.lit(0).cast("long")).alias(SEQ),
        F.col(value_col).alias(VALUE),
    )


def kafka_ticks(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    value_schema: str,
    ts_field: str,
    value_field: str,
    key_from: str = "kafka_key",
    starting_offsets: str = "latest",
) -> DataFrame:
    """KafkaAdapterManager.subscribe parity (csp/adapters/kafka.py:39-191):
    JSON MsgMapper decode, start_offset replay via starting_offsets.
    ``seq`` is the Kafka partition offset — per-partition ordering is
    exactly the reference's per-adapter ordering guarantee
    (SURVEY.md §2.8 'realtime push semantics')."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("timestamp").alias("kafka_ts"),
        F.col("offset"),
    )
    ts_expr = (
        F.col(f"v.{ts_field}").cast("timestamp")
        if ts_field
        else F.col("kafka_ts")
    )
    return parsed.select(
        F.col(key_from).cast("string").alias(KEY),
        ts_expr.alias(TS),
        F.col("offset").alias(SEQ),
        F.col(f"v.{value_field}").alias(VALUE),
    )
