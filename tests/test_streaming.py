"""Streaming-mode tests: same tick schema, Structured Streaming
execution, verified against the batch operators on identical data
(the reference runs the same graph in both modes —
docs/wiki/concepts/Execution-Modes.md)."""

import datetime as dt
import math
import shutil

import pytest
from pyspark.sql import functions as F

from csp_spark import KEY, SEQ, TS, VALUE, TickStream
from csp_spark.stats import ema
from csp_spark.streaming import (
    burst_stream,
    collect_stream,
    conflate_last_value,
    ema_stream,
    file_ticks,
)

START = dt.datetime(2020, 1, 1)
SCHEMA = "key string, ts timestamp, seq long, value double"


def _mk_ticks(n=40, keys=("a", "b")):
    rows = []
    for k in keys:
        for i in range(n):
            rows.append((k, START + dt.timedelta(seconds=3 * i + (0 if k == "a" else 1)), 0, float(i) + (0.5 if k == "b" else 0.0)))
    return rows


@pytest.fixture()
def landing(spark, tmp_path):
    """Three chronological parquet drops — three microbatches."""
    rows = _mk_ticks()
    rows.sort(key=lambda r: (r[1], r[0]))
    d = tmp_path / "landing"
    d.mkdir()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            str(d / f"chunk{i}.parquet")
        )
    yield str(d) + "/*/", rows
    shutil.rmtree(d, ignore_errors=True)


def test_file_source_roundtrip(spark, landing):
    path, rows = landing
    stream = file_ticks(
        spark, path, SCHEMA, ts_col="ts", value_col="value", key_col="key"
    )
    got = collect_stream(stream)
    assert got.count() == len(rows)
    s = {(r[0], r[1], r[2]) for r in got.select(KEY, TS, VALUE).collect()}
    e = {(k, ts, v) for (k, ts, _seq, v) in rows}
    assert s == e


def test_conflate_last_value(spark, landing):
    path, rows = landing
    stream = file_ticks(
        spark, path, SCHEMA, ts_col="ts", value_col="value", key_col="key"
    )
    bucket = dt.timedelta(seconds=30)
    got = collect_stream(conflate_last_value(stream, bucket), output_mode="complete").collect()
    # batch oracle: newest value per (key, 30s bucket)
    expect = {}
    for k, ts, seq, v in rows:
        b = int(ts.timestamp() // 30)
        cur = expect.get((k, b))
        if cur is None or (ts, seq) >= cur[:2]:
            expect[(k, b)] = (ts, seq, v)
    assert len(got) == len(expect)
    for r in got:
        b = int(r[TS].timestamp() // 30) - 1  # ts is window END
        assert math.isclose(r[VALUE], expect[(r[KEY], b)][2])


def test_burst_stream(spark, landing):
    path, rows = landing
    stream = file_ticks(
        spark, path, SCHEMA, ts_col="ts", value_col="value", key_col="key"
    )
    got = collect_stream(burst_stream(stream, dt.timedelta(seconds=30)), output_mode="complete").collect()
    expect: dict[tuple, list] = {}
    for k, ts, seq, v in sorted(rows, key=lambda r: (r[1], r[2])):
        expect.setdefault((k, int(ts.timestamp() // 30)), []).append(v)
    for r in got:
        b = int(r[TS].timestamp() // 30) - 1
        assert list(r[VALUE]) == expect[(r[KEY], b)]


def test_ema_stream_matches_batch(spark, landing):
    """Stateful streaming EMA == batch EMA on the same ticks, state
    carried across 3 microbatches."""
    path, rows = landing
    stream = file_ticks(
        spark, path, SCHEMA, ts_col="ts", value_col="value", key_col="key",
        max_files_per_trigger=1,
    )
    got = (
        collect_stream(ema_stream(stream, alpha=0.2))
        .orderBy(KEY, TS, SEQ)
        .collect()
    )
    batch = TickStream(spark.createDataFrame(rows, SCHEMA))
    expect = ema(batch, alpha=0.2, adjust=False).ordered().collect()
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert (g[KEY], g[TS]) == (e[KEY], e[TS])
        assert math.isclose(g[VALUE], e[VALUE], rel_tol=1e-12)
