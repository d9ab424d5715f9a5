"""Sinks, non-parquet sources, basketlib, and random generators."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from csp_spark import KEY, SEQ, TS, VALUE, TickStream
from csp_spark.operators.basketlib import sample_basket, sync
from csp_spark.sinks import publish_csv, publish_parquet, write_record_batches
from csp_spark.sources import from_arrow, read_csv, read_table
from csp_spark.sources.random_gen import brownian_motion, poisson_timer

START = dt.datetime(2020, 1, 1)
TD = dt.timedelta


def _ticks(spark, pairs, key="k"):
    return TickStream.from_rows(spark, pairs, key=key)


def test_parquet_roundtrip(spark, tmp_path):
    x = _ticks(spark, [(START + TD(days=i), float(i)) for i in range(5)])
    publish_parquet(x, str(tmp_path / "out"))
    back = read_table(spark, str(tmp_path / "out"))
    assert back.count() == 5
    # date partitioning applied
    assert any(p.name.startswith("__date=") for p in (tmp_path / "out").iterdir())


def test_csv_roundtrip(spark, tmp_path):
    x = _ticks(spark, [(START + TD(seconds=i), float(i)) for i in range(7)])
    publish_csv(x, str(tmp_path / "out_csv"))
    back = read_csv(
        spark,
        str(tmp_path / "out_csv"),
        ts_col=TS,
        value_col=VALUE,
        key_col=KEY,
        schema="key string, ts timestamp, seq long, value double",
    )
    got = back.collect_ticks("k")
    assert [v for _, v in got] == [float(i) for i in range(7)]


def test_arrow_roundtrip(spark):
    x = _ticks(spark, [(START + TD(seconds=i), float(i)) for i in range(4)])
    tbl = write_record_batches(x)
    assert tbl.num_rows == 4
    back = from_arrow(spark, tbl, ts_col=TS, value_col=VALUE, key_col=KEY)
    assert back.collect_ticks("k") == x.collect_ticks("k")


def test_sync_complete_buckets(spark):
    a = _ticks(spark, [(START + TD(seconds=1), 1.0), (START + TD(seconds=61), 3.0)])
    b = _ticks(spark, [(START + TD(seconds=2), 2.0)])
    out = sync({"a": a, "b": b}, threshold=TD(minutes=1), output_incomplete=False)
    rows = out.ordered().collect()
    # bucket 0 has both members; bucket 1 only 'a' -> dropped
    assert len(rows) == 1
    assert rows[0][TS] == START + TD(seconds=2)
    assert dict(rows[0][VALUE]) == {"a": 1.0, "b": 2.0}
    # the default (reference basketlib.py:60 output_incomplete=True)
    # keeps the partial bucket
    out2 = sync({"a": a, "b": b}, threshold=TD(minutes=1))
    assert out2.df.count() == 2


def test_sync_list_and_trigger(spark):
    from csp_spark.operators.basketlib import sync_list

    a = _ticks(spark, [(START + TD(seconds=1), 1.0), (START + TD(seconds=61), 3.0)])
    b = _ticks(spark, [(START + TD(seconds=2), 2.0)])
    # list basket -> list basket; incomplete batch: only member 0 ticks
    ra, rb = sync_list([a, b], threshold=TD(minutes=1))
    assert [v for _, v in ra.collect_ticks("k")] == [1.0, 3.0]
    assert [v for _, v in rb.collect_ticks("k")] == [2.0]
    # trigger opens the window: a trigger at t=60 collects the ticks in
    # [60, 120); the t=1/t=2 ticks precede any window and are dropped
    trig = _ticks(spark, [(START + TD(seconds=60), 0.0)])
    out = sync({"a": a, "b": b}, threshold=TD(minutes=1), trigger=trig)
    rows = out.ordered().collect()
    assert len(rows) == 1
    assert dict(rows[0][VALUE]) == {"a": 3.0}  # unset member omitted
    # triggers inside an open window are ignored (reference: alarm
    # re-arms only after it fires): t=60 and t=90 -> one window
    trig2 = _ticks(
        spark, [(START + TD(seconds=60), 0.0), (START + TD(seconds=90), 0.0)]
    )
    out2 = sync({"a": a, "b": b}, threshold=TD(minutes=1), trigger=trig2)
    assert out2.df.count() == 1


def test_sample_list(spark):
    from csp_spark.operators.basketlib import sample_basket

    trig = _ticks(spark, [(START + TD(seconds=10), 0.0), (START + TD(seconds=20), 0.0)])
    a = _ticks(spark, [(START + TD(seconds=1), 1.0), (START + TD(seconds=15), 1.5)])
    b = _ticks(spark, [(START + TD(seconds=12), 2.0)])
    ra, rb = sample_basket(trig, [a, b])
    # member b is not yet valid at the first trigger -> no tick
    assert [v for _, v in ra.collect_ticks("k")] == [1.0, 1.5]
    assert [v for _, v in rb.collect_ticks("k")] == [2.0]


def test_sample_basket(spark):
    trig = _ticks(spark, [(START + TD(seconds=10), 0.0), (START + TD(seconds=20), 0.0)])
    a = _ticks(spark, [(START + TD(seconds=1), 1.0), (START + TD(seconds=15), 1.5)])
    b = _ticks(spark, [(START + TD(seconds=12), 2.0)])
    out = sample_basket(trig, {"a": a, "b": b}).ordered().collect()
    assert len(out) == 2
    assert out[0][VALUE]["a"] == 1.0 and out[0][VALUE]["b"] is None
    assert out[1][VALUE]["a"] == 1.5 and out[1][VALUE]["b"] == 2.0


def test_poisson_timer_deterministic(spark):
    x = poisson_timer(spark, rate=1.0, start=START, end=START + TD(minutes=10), seed=7)
    t1 = x.collect_ticks()
    t2 = poisson_timer(
        spark, rate=1.0, start=START, end=START + TD(minutes=10), seed=7
    ).collect_ticks()
    assert t1 == t2
    assert all(START <= ts <= START + TD(minutes=10) for ts, _ in t1)
    # rate sanity: ~600 events +- 5 sigma
    assert 600 - 5 * 25 <= len(t1) <= 600 + 5 * 25
    gaps = [
        (b[0] - a[0]).total_seconds() for a, b in zip(t1, t1[1:])
    ]
    mean_gap = sum(gaps) / len(gaps)
    assert 0.7 <= mean_gap <= 1.4


def test_brownian_motion_stats(spark):
    trig = _ticks(spark, [(START + TD(seconds=i), 0.0) for i in range(2000)])
    x = brownian_motion(trig, drift=0.0, vol=1.0, seed=3)
    vals = [v for _, v in x.collect_ticks("k")]
    assert len(vals) == 2000
    assert vals[0] == 0.0  # first tick: dt=0
    incr = [b - a for a, b in zip(vals, vals[1:])]
    mean = sum(incr) / len(incr)
    var = sum((i - mean) ** 2 for i in incr) / len(incr)
    assert abs(mean) < 0.1 and 0.8 < var < 1.2
    gbm = brownian_motion(trig, drift=0.0, vol=0.2, x0=100.0, seed=3, geometric=True)
    gvals = [v for _, v in gbm.collect_ticks("k")]
    assert gvals[0] == 100.0 and all(v > 0 for v in gvals)


def test_brownian_motion_nd_covariance(spark):
    """N-d correlated path: empirical increment covariance matches the
    requested matrix (reference csp/random.py:70-133 brownian_motion
    with full covariance; test style mirrors the reference's
    statistical assertions in csp/tests/test_random.py)."""
    import numpy as np

    from csp_spark.sources.random_gen import brownian_motion_nd

    trig = _ticks(spark, [(START + TD(seconds=10 * i), 0.0) for i in range(3000)])
    cov = [[4.0, 1.2], [1.2, 1.0]]
    bm = brownian_motion_nd(trig, drift=[0.0, 0.0], covariance=cov, seed=7)
    path = np.array([v for _, v in bm.collect_ticks("k")])
    assert path.shape == (3000, 2) and path[0].tolist() == [0.0, 0.0]
    inc = np.diff(path, axis=0) / np.sqrt(10.0)
    emp = np.cov(inc.T)
    assert abs(emp[0, 0] - 4.0) < 0.5 and abs(emp[1, 1] - 1.0) < 0.15
    assert abs(emp[0, 1] - 1.2) < 0.25


def test_adapters_namespace():
    """csp.adapters-style imports resolve to the Spark implementations."""
    from csp_spark.adapters import arrow, csv, db, kafka, parquet, websocket

    assert callable(parquet.read_table) and callable(parquet.subscribe)
    assert callable(csv.read_csv) and callable(db.read_jdbc)
    assert callable(arrow.from_arrow) and callable(kafka.kafka_ticks)
    assert callable(websocket.socket_ticks)


def test_top_level_surface():
    """The package root mirrors the reference's `import csp` names."""
    import csp_spark as csp

    for name in ("merge", "filter", "sample", "delay", "const", "timer",
                 "apply", "print", "log", "stop_engine", "value_at",
                 "schedule_alarm", "Struct", "Enum", "min", "max", "erf",
                 "ticked", "valid", "now", "num_ticks"):
        assert callable(getattr(csp, name)) or hasattr(csp, name), name
    missing = [n for n in csp.__all__ if not hasattr(csp, n)]
    assert not missing, missing


def test_publish_struct_flattens_fields(spark, tmp_path):
    """publish_struct: one parquet column per struct field, unset
    (NULL) fields preserved, field_map applied after flattening."""
    from csp_spark.sinks import publish_struct

    df = spark.createDataFrame(
        [
            ("k", START, 0, (1.0, "a")),
            ("k", START + TD(seconds=1), 0, (2.0, None)),
        ],
        "key string, ts timestamp, seq long, "
        "value struct<px: double, venue: string>",
    )
    out = str(tmp_path / "sp")
    publish_struct(df, out, field_map={"px": "price"})
    back = read_table(spark, out)
    assert {"key", "ts", "seq", "price", "venue"} <= set(back.columns)
    assert "value" not in back.columns
    rows = sorted(back.collect(), key=lambda r: r["ts"])
    assert rows[0]["price"] == 1.0 and rows[0]["venue"] == "a"
    assert rows[1]["price"] == 2.0 and rows[1]["venue"] is None


def test_record_batch_pull_and_capsule(spark):
    import pyarrow as pa

    from csp_spark.adapters.arrow import RecordBatchPullInputAdapter

    tbl = pa.table(
        {
            "t": [START + TD(seconds=i) for i in range(6)],
            "px": [float(i) for i in range(6)],
        }
    )
    batches = tbl.to_batches(max_chunksize=2)
    x = RecordBatchPullInputAdapter(spark, "t", iter(batches))
    assert [v for _, v in x.collect_ticks()] == [float(i) for i in range(6)]
    # PyCapsule C Data path (CRecordBatchPullInputAdapter contract):
    # feed raw __arrow_c_array__() tuples
    caps = [rb.__arrow_c_array__() for rb in tbl.to_batches(max_chunksize=3)]
    y = RecordBatchPullInputAdapter(spark, "t", iter(caps))
    assert y.collect_ticks() == x.collect_ticks()


def test_record_batches_struct_roundtrip(spark):
    import pyarrow as pa

    from csp_spark.adapters.arrow import (
        record_batches_to_struct,
        struct_to_record_batches,
    )
    from csp_spark.core.record import Struct

    class Quote(Struct):
        price: float
        size: int

    tbl = pa.table(
        {
            "t": [START + TD(seconds=i) for i in range(4)],
            "p": [1.0, 2.0, 3.0, 4.0],
            "sz": [10, 20, 30, 40],
        }
    )
    x = record_batches_to_struct(
        spark, tbl.to_batches(), Quote, ts_col="t",
        field_map={"price": "p", "size": "sz"},
    )
    rows = x.ordered().collect()
    assert rows[0][VALUE]["price"] == 1.0 and rows[0][VALUE]["size"] == 10
    # back out: struct fields -> arrow columns, renamed + chunked
    out = struct_to_record_batches(
        x, field_map={"price": "p", "size": "sz"}, max_batch_size=3
    )
    assert sum(b.num_rows for b in out) == 4
    assert len(out) == 2  # 4 rows chunked at 3
    cols = set(out[0].schema.names)
    assert {"p", "sz"} <= cols


def test_parquet_reader_writer_classes(spark, tmp_path):
    from csp_spark.adapters.parquet import (
        ParquetOutputConfig,
        ParquetReader,
        ParquetWriter,
    )

    x = _ticks(spark, [(START + TD(seconds=i), float(i)) for i in range(5)])
    w = ParquetWriter(
        str(tmp_path / "pw"), TS, ParquetOutputConfig(allow_overwrite=True)
    )
    w.publish(x)
    r = ParquetReader(
        spark, str(tmp_path / "pw"), time_column=TS, symbol_column=KEY
    )
    back = r.subscribe(column=VALUE, symbol="k")
    assert [v for _, v in back.collect_ticks("k")] == [float(i) for i in range(5)]
    # subscribe_all struct form + time_shift
    r2 = ParquetReader(
        spark,
        str(tmp_path / "pw"),
        time_column=TS,
        symbol_column=KEY,
        time_shift=TD(minutes=1),
    )
    st = r2.subscribe_all([VALUE, SEQ])
    rows = st.ordered().collect()
    assert rows[0][TS] == START + TD(minutes=1)
    assert rows[0][VALUE][VALUE] == 0.0
    # arrow-binary egress path
    w2 = ParquetWriter(
        str(tmp_path / "pw2"), TS,
        ParquetOutputConfig(write_arrow_binary=True),
    )
    tbl = w2.publish(x)
    assert tbl.num_rows == 5


def test_parquet_writer_named_columns_keyed(spark, tmp_path):
    """Named-column publish of KEYED streams: coincident (ts, seq)
    cycles on different keys must stay separate rows — the flush join
    aligns per (key, ts, seq), not (ts, seq) alone."""
    from csp_spark.adapters.parquet import ParquetOutputConfig, ParquetWriter

    rows = [(START + TD(seconds=i), float(i)) for i in range(3)]
    a = TickStream(
        _ticks(spark, rows, key="k1").df.unionByName(
            _ticks(spark, rows, key="k2").df
        )
    )
    b = TickStream(
        _ticks(spark, [(ts, v * 10) for ts, v in rows], key="k1").df.unionByName(
            _ticks(spark, [(ts, v * 10) for ts, v in rows], key="k2").df
        )
    )
    w = ParquetWriter(
        str(tmp_path / "pwk"), TS, ParquetOutputConfig(allow_overwrite=True)
    )
    # arm manually so both columns accumulate into ONE flush (inside a
    # csp.run the engine-stop hook does this)
    w._armed = True
    w.publish("a_col", a)
    w.publish("b_col", b)
    w.flush()
    back = spark.read.parquet(str(tmp_path / "pwk"))
    got = back.orderBy(KEY, TS).collect()
    # 3 cycles x 2 keys, no cross-key duplication
    assert len(got) == 6
    assert {r[KEY] for r in got} == {"k1", "k2"}
    for r in got:
        assert r["b_col"] == r["a_col"] * 10


def test_parquet_writer_named_columns_global(spark, tmp_path):
    """Global-key named-column publish keeps the reference row shape:
    no key column in the written file."""
    from csp_spark.adapters.parquet import ParquetOutputConfig, ParquetWriter
    from csp_spark.core.ticks import GLOBAL_KEY

    x = _ticks(
        spark,
        [(START + TD(seconds=i), float(i)) for i in range(3)],
        key=GLOBAL_KEY,
    )
    w = ParquetWriter(
        str(tmp_path / "pwg"), TS, ParquetOutputConfig(allow_overwrite=True)
    )
    w.publish("v", x)
    w.flush()
    back = spark.read.parquet(str(tmp_path / "pwg"))
    assert KEY not in back.columns
    assert [r["v"] for r in back.orderBy(TS).collect()] == [0.0, 1.0, 2.0]


def test_status_and_msgmapper(spark):
    from csp_spark.adapters.status import Level, Status
    from csp_spark.adapters.utils import (
        DateTimeType,
        JSONTextMessageMapper,
        RawBytesMessageMapper,
        RawTextMessageMapper,
        epoch_to_ts,
    )

    s = Status(level=int(Level.ERROR), status_code=7, msg="disconnect")
    assert s.level == 3 and s.to_dict()["msg"] == "disconnect"

    df = spark.createDataFrame(
        [(bytearray(b'{"t": 1577836800000, "px": 1.5}'),)], "value binary"
    )
    m = JSONTextMessageMapper(DateTimeType.UINT64_MILLIS)
    parsed = df.select(
        m.decode(F.col("value"), "t long, px double").alias("v")
    ).select(
        epoch_to_ts(F.col("v.t"), DateTimeType.UINT64_MILLIS).alias("ts"),
        F.col("v.px").alias("px"),
    )
    row = parsed.first()
    assert row["ts"] == dt.datetime(2020, 1, 1) and row["px"] == 1.5
    raw = df.select(RawTextMessageMapper().decode(F.col("value")).alias("s")).first()
    assert raw["s"].startswith('{"t"')
    rb = df.select(RawBytesMessageMapper().decode(F.col("value")).alias("b")).first()
    assert bytes(rb["b"]).startswith(b'{"t"')


def test_pull_adapter_authoring(spark):
    """User pull-adapter (reference PullInputAdapter/py_pull_adapter_def):
    a next()-based source replays into a TickStream with window clipping
    and lifecycle hooks."""
    from csp_spark.sources import (
        PullInputAdapter,
        from_pull_adapter,
        py_pull_adapter_def,
    )

    class Fib(PullInputAdapter):
        def __init__(self, n=10):
            super().__init__()
            self.n = n
            self.stopped = False

        def start(self, start_time, end_time):
            super().start(start_time, end_time)
            self.a, self.b, self.i = 0.0, 1.0, 0

        def stop(self):
            self.stopped = True

        def next(self):
            if self.i >= self.n:
                return None
            out = (START + TD(seconds=self.i), self.a)
            self.a, self.b = self.b, self.a + self.b
            self.i += 1
            return out

    ad = Fib(8)
    x = from_pull_adapter(spark, ad, key="fib")
    assert [v for _, v in x.collect_ticks("fib")] == [0, 1, 1, 2, 3, 5, 8, 13]
    assert ad.stopped
    # window clipping + factory convention
    FibAdapter = py_pull_adapter_def("FibAdapter", Fib, "double", n=8)
    y = FibAdapter(spark, start=START + TD(seconds=2), end=START + TD(seconds=5))
    assert [v for _, v in y.collect_ticks()] == [1.0, 2.0, 3.0, 5.0]


def test_output_adapter_authoring(spark):
    """User output adapter (reference OutputAdapter): on_tick receives
    every tick in engine order with start/stop bracketing."""
    from csp_spark.sinks.publish import (
        OutputAdapter,
        py_output_adapter_def,
        to_output_adapter,
    )

    x = _ticks(spark, [(START + TD(seconds=i), float(i * i)) for i in range(6)])

    class Collect(OutputAdapter):
        def __init__(self, scale=1.0):
            self.scale = scale
            self.got = []
            self.events = []

        def start(self):
            self.events.append("start")

        def stop(self):
            self.events.append("stop")

        def on_tick(self, time, value):
            self.got.append((time, value * self.scale))

    c = Collect()
    n = to_output_adapter(x, c)
    assert n == 6 and c.events == ["start", "stop"]
    assert c.got == [(START + TD(seconds=i), float(i * i)) for i in range(6)]
    # factory convention with bound kwargs
    made = []
    class Collect2(Collect):
        def __init__(self, scale=1.0):
            super().__init__(scale)
            made.append(self)
    Out = py_output_adapter_def("Out", Collect2, scale=2.0)
    assert Out(x) == 6
    assert made[0].got[3] == (START + TD(seconds=3), 18.0)


def test_adapter_manager_authoring(spark):
    """User sim adapter manager: one drained source feeds several
    channel subscriptions, with lifecycle bracketing."""
    from csp_spark.sources import AdapterManager

    class Feed(AdapterManager):
        def __init__(self, spark):
            super().__init__(spark)
            self.events = []

        def start(self, start_time=None, end_time=None):
            self.events.append("start")

        def stop(self):
            self.events.append("stop")

        def timeslices(self):
            for i in range(6):
                ts = START + TD(seconds=i)
                yield (ts, "trade" if i % 2 == 0 else "quote", "AAPL", float(i))

    mgr = Feed(spark)
    trades = mgr.subscribe("trade")
    quotes = mgr.subscribe("quote")
    assert [v for _, v in trades.collect_ticks("AAPL")] == [0.0, 2.0, 4.0]
    assert [v for _, v in quotes.collect_ticks("AAPL")] == [1.0, 3.0, 5.0]
    # drained exactly once despite two subscriptions
    assert mgr.events == ["start", "stop"]


def test_pull_adapter_exact_max_ticks_ok(spark):
    """An adapter yielding exactly max_ticks rows then None must NOT
    raise (review regression: for-else off-by-one)."""
    from csp_spark.sources import PullInputAdapter, from_pull_adapter

    class N(PullInputAdapter):
        def __init__(self, n):
            super().__init__()
            self.n, self.i = n, 0

        def next(self):
            if self.i >= self.n:
                return None
            out = (START + TD(seconds=self.i), float(self.i))
            self.i += 1
            return out

    x = from_pull_adapter(spark, N(5), max_ticks=5)
    assert x.df.count() == 5
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="max_ticks"):
        from_pull_adapter(spark, N(6), max_ticks=5)


def test_epoch_to_ts_nanos_exact(spark):
    """Nanosecond epochs above 2^53 decode exactly (review regression:
    double division rounded near-boundary values into the previous
    microsecond)."""
    from csp_spark.adapters.utils import DateTimeType, epoch_to_ts

    # 2020-01-01 00:00:00.000001 in ns, +999 ns — must decode to the
    # SAME microsecond, not the previous one
    base_us = 1577836800000001
    for extra in (0, 1, 999):
        ns = base_us * 1000 + extra
        df = spark.createDataFrame([(ns,)], "t long")
        got = df.select(
            epoch_to_ts(F.col("t"), DateTimeType.UINT64_NANOS).alias("ts")
        ).first()["ts"]
        assert got == dt.datetime(2020, 1, 1, 0, 0, 0, 1), (extra, got)


def test_json_mapper_converts_ts_fields(spark):
    """The JSON mapper applies its wire format to declared epoch
    fields itself (reference mapper behavior)."""
    from csp_spark.adapters.utils import DateTimeType, JSONTextMessageMapper

    df = spark.createDataFrame(
        [(bytearray(b'{"t": 1577836800000, "px": 2.5}'),)], "value binary"
    )
    m = JSONTextMessageMapper(DateTimeType.UINT64_MILLIS)
    row = df.select(
        m.decode(F.col("value"), "t long, px double", ts_fields=["t"]).alias("v")
    ).first()["v"]
    assert row["t"] == dt.datetime(2020, 1, 1) and row["px"] == 2.5


# ------------------------------------------------- chat sinks + dev tools


def test_slack_symphony_publish_with_injected_sender(spark):
    """adapters/slack.py publish_messages: one webhook POST per tick in
    engine order through the injectable sender (this container has no
    network — the swap-in contract is the point)."""
    import json

    from csp_spark.adapters import slack, symphony
    from csp_spark.operators import baselib as bl

    start = dt.datetime(2020, 1, 1)
    x = bl.curve(spark, [(start, 1.5), (start + dt.timedelta(seconds=1), 2.5)])
    sent = []
    n = slack.publish_messages(x, "#alerts", sender=sent.append)
    assert n == 2 and len(sent) == 2
    msgs = [json.loads(b) for b in sent]
    assert all(m["channel"] == "#alerts" for m in msgs)
    assert "1.5" in msgs[0]["text"] and "2.5" in msgs[1]["text"]
    # symphony shares the wire shape
    assert symphony.publish_messages is slack.publish_messages


def test_csp_watch_profile_diffs():
    """utils/csp_watch_profile: polls a Spark-UI-shaped REST API and
    prints per-interval stage/memory diffs (reference
    csp_watch_profile.py flag + diff shape)."""
    import http.server
    import io
    import json as _json
    import threading
    from contextlib import redirect_stdout

    from csp_spark.utils import csp_watch_profile as wp

    snaps = [
        {"stages": [{"stageId": 1, "name": "scan parquet", "numCompleteTasks": 4,
                     "executorRunTime": 1000}],
         "jobs": [{}], "execs": [{"id": "driver", "rddBlocks": 1,
                                  "memoryUsed": 100}]},
        {"stages": [{"stageId": 1, "name": "scan parquet", "numCompleteTasks": 9,
                     "executorRunTime": 3500}],
         "jobs": [{}, {}], "execs": [{"id": "driver", "rddBlocks": 1,
                                      "memoryUsed": 350}]},
    ]
    state = {"i": 0}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.endswith("/applications"):
                state["i"] += 1  # applications fetched once per poll
                body = [{"id": "app-1"}]
            else:
                s = snaps[min(state["i"] - 1, 1)]
                if self.path.endswith("/stages"):
                    body = s["stages"]
                elif self.path.endswith("/jobs"):
                    body = s["jobs"]
                else:
                    body = s["execs"]
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            wp.watch(f"http://127.0.0.1:{srv.server_port}", interval=0.01,
                     include_mem=True, max_polls=2)
        out = buf.getvalue()
        assert "scan parquet#1" in out
        assert "5" in out and "2.5" in out  # +5 tasks, +2.5 s runtime
        assert "Memory diffs" in out and "250" in out  # +250 bytes
    finally:
        srv.shutdown()


def test_parquet_utility_nodes_roundtrip(spark, tmp_path):
    """flatten_numpy_array / reshape_numpy_array (reference
    csp/adapters/output_adapters/parquet_utility_nodes.py:11-33):
    an ND-array edge flattens to (value, shape) 1-D streams, survives
    a ParquetWriter publish + read_table round trip, and reshapes back
    bit-identically."""
    from csp_spark.adapters.output_adapters import (
        flatten_numpy_array, reshape_numpy_array,
    )

    mats = [
        [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]],
        [[7.0, 8.0], [9.0, 10.0], [11.0, 12.0]],
    ]
    rows = [("k", START + TD(seconds=i), i, m) for i, m in enumerate(mats)]
    x = TickStream(spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, value array<array<double>>"
    ))
    flat = flatten_numpy_array(x)
    got = {r[SEQ]: (r_v, r_s) for r, r_v, r_s in [
        (r, r["v"], r["s"]) for r in flat.value.df.alias("a").join(
            flat.shape.df.alias("b"), [KEY, TS, SEQ]
        ).select(
            SEQ, F.col(f"a.{VALUE}").alias("v"), F.col(f"b.{VALUE}").alias("s")
        ).collect()
    ]}
    assert got[0] == ([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], [2, 3])
    assert got[1] == ([7.0, 8.0, 9.0, 10.0, 11.0, 12.0], [3, 2])

    # ParquetWriter path: publish both streams, read back, reshape
    publish_parquet(flat.value, str(tmp_path / "val"))
    publish_parquet(flat.shape, str(tmp_path / "shp"))
    v_back = TickStream(read_table(spark, str(tmp_path / "val"))
                        .select(KEY, TS, SEQ, VALUE))
    s_back = TickStream(read_table(spark, str(tmp_path / "shp"))
                        .select(KEY, TS, SEQ, VALUE))
    restored = reshape_numpy_array(v_back, s_back)
    out = {r[SEQ]: r[VALUE] for r in restored.df.collect()}
    assert out[0] == mats[0] and out[1] == mats[1]


def test_parquet_utility_nodes_3d_and_1d(spark):
    """Rank-3 flatten/reshape (static ndim=3) and the rank-1 identity."""
    from csp_spark.adapters.output_adapters import (
        flatten_numpy_array, reshape_numpy_array,
    )

    cube = [[[float(100 * i + 10 * j + k) for k in range(4)]
             for j in range(3)] for i in range(2)]
    x = TickStream(spark.createDataFrame(
        [("k", START, 0, cube)],
        "key string, ts timestamp, seq long, "
        "value array<array<array<double>>>",
    ))
    flat = flatten_numpy_array(x)
    r = flat.shape.df.collect()[0]
    assert r[VALUE] == [2, 3, 4]
    import numpy as np

    assert flat.value.df.collect()[0][VALUE] == \
        list(np.asarray(cube).reshape(-1))
    back = reshape_numpy_array(flat.value, flat.shape, ndim=3)
    assert back.df.collect()[0][VALUE] == cube

    one = TickStream(spark.createDataFrame(
        [("k", START, 0, [1.0, 2.0])],
        "key string, ts timestamp, seq long, value array<double>",
    ))
    f1 = flatten_numpy_array(one)
    assert f1.shape.df.collect()[0][VALUE] == [2]
    b1 = reshape_numpy_array(f1.value, f1.shape, ndim=1)
    assert b1.df.collect()[0][VALUE] == [1.0, 2.0]

    with pytest.raises(TypeError):
        flatten_numpy_array(TickStream(spark.createDataFrame(
            [("k", START, 0, 1.0)],
            "key string, ts timestamp, seq long, value double",
        )))


def test_dbreader_class_surface(spark):
    """Class-shaped DBReader + TimeAccessor family (reference
    csp/adapters/db.py:36-440): a reference-style program — construct
    via create_from_connection, subscribe(symbol, typ) inside a graph,
    run with a window — against a real sqlite table, cross-checked
    row-for-row against a direct cursor query (the independent
    oracle)."""
    import sqlite3

    import pytest

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.db import (
        DateTimeAccessor, DBReader, EngineStartTimeAccessor,
        TimestampAccessor,
    )

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE prices (ts TEXT, symbol TEXT, price REAL, size INTEGER)"
    )
    rows = [
        ("2020-01-01 09:30:00", "AAPL", 100.0, 10),
        ("2020-01-01 09:31:00", "AAPL", 101.0, 20),
        ("2020-01-01 09:32:00", "IBM", 50.0, 5),
        ("2020-01-02 09:30:00", "AAPL", 102.0, 30),
    ]
    conn.executemany("INSERT INTO prices VALUES (?,?,?,?)", rows)
    conn.commit()

    class Price(csp.Struct):
        price: float
        size: int

    # --- the reference program shape: reader in a graph, run windowed
    def graph():
        reader = DBReader.create_from_connection(
            conn,
            TimestampAccessor("ts", tz="UTC"),
            table_name="prices",
            symbol_column="symbol",
        )
        return {"aapl": reader.subscribe("AAPL", Price)}

    res = csp.run(
        graph,
        starttime=dt.datetime(2020, 1, 1),
        endtime=dt.datetime(2020, 1, 1, 23, 59),
    )
    # independent oracle: the same constraint through a raw cursor
    want = conn.execute(
        "SELECT ts, price, size FROM prices WHERE symbol='AAPL' "
        "AND ts BETWEEN '2020-01-01 00:00:00' AND '2020-01-01 23:59:00' "
        "ORDER BY ts"
    ).fetchall()
    got = [(t.strftime("%Y-%m-%d %H:%M:%S"), v.price, v.size)
           for t, v in res["aapl"]]
    assert got == want and len(got) == 2

    # --- typ=None: schema_struct dynamically defined via define_struct
    reader = DBReader.create_from_connection(
        conn, TimestampAccessor("ts", tz="UTC"),
        table_name="prices", symbol_column="symbol",
    )
    S = reader.schema_struct()
    assert S.__name__.startswith("DBDynStruct_prices")
    assert S.__metadata__["price"] is float
    assert S.__metadata__["size"] is int
    dyn = reader.subscribe("IBM", None).collect_ticks("IBM")
    assert len(dyn) == 1 and dyn[0][1].price == 50.0

    # subscribe_all + scalar (str field_map) subscription
    allv = reader.subscribe_all(Price).df.collect()
    assert len(allv) == len(rows)
    scal = reader.subscribe("AAPL", Price, field_map="price")
    assert [v for _, v in scal.collect_ticks("AAPL")] == [100.0, 101.0, 102.0]

    # --- DateTimeAccessor: separate date/time columns, span window
    conn.execute("CREATE TABLE bars (d TEXT, t TEXT, symbol TEXT, px REAL)")
    conn.executemany("INSERT INTO bars VALUES (?,?,?,?)", [
        ("2020-01-01", "09:30:00", "A", 1.0),
        ("2020-01-01", "10:30:00", "A", 2.0),
        ("2020-01-02", "09:00:00", "A", 3.0),
        ("2020-01-03", "09:00:00", "A", 4.0),
    ])
    conn.commit()

    def bars_graph():
        r = DBReader(
            conn, DateTimeAccessor("d", "t", tz="UTC"),
            table_name="bars", symbol_column="symbol",
        )
        return {"a": r.subscribe("A", None)}

    # boundary-day times excluded per the reference's three-conjunct
    # constraint: start 01-01 10:00 drops 09:30, end 01-03 08:00
    # drops day-3 09:00
    res = csp.run(
        bars_graph,
        starttime=dt.datetime(2020, 1, 1, 10),
        endtime=dt.datetime(2020, 1, 3, 8),
    )
    assert [t for t, _ in res["a"]] == [
        dt.datetime(2020, 1, 1, 10, 30), dt.datetime(2020, 1, 2, 9, 0),
    ]

    # --- EngineStartTimeAccessor: all rows stamped at engine start
    def const_graph():
        r = DBReader(
            conn, EngineStartTimeAccessor(),
            table_name="prices", symbol_column="symbol",
        )
        return {"x": r.subscribe("AAPL", Price)}

    res = csp.run(
        const_graph,
        starttime=dt.datetime(2020, 1, 5),
        endtime=dt.datetime(2020, 1, 6),
    )
    assert len(res["x"]) == 3
    assert all(t == dt.datetime(2020, 1, 5) for t, _ in res["x"])

    # --- reference construction rules
    with pytest.raises(RuntimeError, match="Must specify table name or query"):
        DBReader(conn, TimestampAccessor("ts"))
    with pytest.raises(RuntimeError, match="Must specify table name or query"):
        DBReader(conn, TimestampAccessor("ts"), table_name="x", query="q")
    with pytest.raises(RuntimeError, match="Cannot specify schema name"):
        DBReader(conn, TimestampAccessor("ts"), query="q", schema_name="s")
    with pytest.raises(RuntimeError, match="use_raw_user_queries"):
        DBReader(conn, TimestampAccessor("ts"), table_name="x",
                 use_raw_user_query=True)
    with pytest.raises(RuntimeError, match="no symbol column"):
        DBReader(conn, TimestampAccessor("ts"), table_name="prices")\
            .subscribe("AAPL", Price)

    # --- query form + extra constraint + create_from_url(sqlite://)
    r = DBReader(
        conn, TimestampAccessor("ts", tz="UTC"),
        query="SELECT * FROM prices", symbol_column="symbol",
        constraint=("price > ?", [100.5]),
    )
    vals = [v for _, v in r.subscribe("AAPL", Price).collect_ticks("AAPL")]
    assert [v.price for v in vals] == [101.0, 102.0]

    mem = DBReader.create_from_url(
        "sqlite://", TimestampAccessor("ts", tz="UTC"), query="SELECT 1 AS x"
    )
    assert mem._connection is not None


def test_csvreader_class_surface(spark, tmp_path):
    """Class-shaped CSVReader + time_converter/YYYYMMDD_TIME_formatter
    (reference csp/adapters/csv.py:10-48): a reference-style program
    against a real csv file, cross-checked against a direct pandas
    read (the independent oracle)."""
    import pandas as pd

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.csv import (
        CSVReader, YYYYMMDD_TIME_formatter, time_converter,
    )

    path = str(tmp_path / "ticks.csv")
    lines = [
        "time,symbol,price,size",
        "20200101 09:30:00,AAPL,100.0,10",
        "20200101 09:31:00,AAPL,101.0,20",
        "20200101 09:32:00,IBM,50.0,5",
        "20200102 09:30:00,AAPL,102.0,30",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    class Price(csp.Struct):
        price: float
        size: int

    # the converter is still the reference's row callable
    tc = YYYYMMDD_TIME_formatter("time")
    assert tc({"time": "20200101 09:30:00"}) == dt.datetime(2020, 1, 1, 9, 30)
    assert time_converter("time", "%Y-%m-%d %H:%M:%S")(
        {"time": "2020-01-01 09:30:00"}
    ) == dt.datetime(2020, 1, 1, 9, 30)

    def graph():
        r = CSVReader(path, YYYYMMDD_TIME_formatter("time"),
                      symbol_column="symbol")
        return {"a": r.subscribe("AAPL", Price)}

    res = csp.run(
        graph,
        starttime=dt.datetime(2020, 1, 1),
        endtime=dt.datetime(2020, 1, 1, 23, 59),
    )
    # independent oracle: pandas replays the same filter/window
    pdf = pd.read_csv(path)
    pdf["t"] = pd.to_datetime(pdf["time"], format="%Y%m%d %H:%M:%S")
    want = pdf[(pdf.symbol == "AAPL") & (pdf.t <= "2020-01-01 23:59")]
    assert [(t, v.price, v.size) for t, v in res["a"]] == [
        (r.t.to_pydatetime(), r.price, r.size) for r in want.itertuples()
    ]

    reader = CSVReader(path, tc, symbol_column="symbol")
    assert len(reader.subscribe_all(Price).df.collect()) == 4
    # scalar subscription casts to the requested type
    assert [v for _, v in reader.subscribe(
        "AAPL", float, field_map="price").collect_ticks("AAPL")
    ] == [100.0, 101.0, 102.0]
    # field_map renames csv column -> struct field
    class P2(csp.Struct):
        px: float
    got = reader.subscribe("IBM", P2, field_map={"price": "px"})
    assert [v.px for _, v in got.collect_ticks("IBM")] == [50.0]


def test_kafka_adapter_manager_class_surface(spark):
    """Class-shaped KafkaAdapterManager (reference csp/adapters/
    kafka.py:39-240): construction rules, identity, and the
    subscribe/publish mapping plan over an injected wire frame (the
    decode expressions are identical for the real readStream — no
    broker in this container)."""
    import json

    import pytest

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.kafka import (
        KafkaAdapterManager, KafkaStartOffset, KafkaStatusMessageType,
    )
    from csp.adapters.utils import JSONTextMessageMapper, hash_mutable

    # reference construction rules + identity semantics
    with pytest.raises(ValueError, match="start_offset is not supported"):
        KafkaAdapterManager(
            "b", start_offset=KafkaStartOffset.EARLIEST, group_id="g")
    with pytest.raises(ValueError, match="not settable"):
        KafkaAdapterManager(
            "b", rd_kafka_consumer_conf_options={"group.id": "x"})
    with pytest.raises(TypeError, match="must be a dict"):
        KafkaAdapterManager("b", rd_kafka_conf_options="nope")
    a, b = KafkaAdapterManager("k:9092"), KafkaAdapterManager("k:9092")
    assert a == b and hash(a) == hash(b)
    assert a != KafkaAdapterManager("other:9092")
    assert KafkaStatusMessageType.MSG_DELIVERY_FAILED == 1
    assert hash_mutable({"a": [1, 2]}) == hash_mutable({"a": [1, 2]})

    # wire frame standing in for the Kafka source (same schema)
    rows = [
        ("k1", {"price": 1.5, "size": 3}, "trades", 0, 0,
         dt.datetime(2020, 1, 1, 9, 30)),
        ("k1", {"price": 2.5, "size": 4}, "trades", 0, 1,
         dt.datetime(2020, 1, 1, 9, 31)),
        ("k2", {"price": 9.0, "size": 1}, "trades", 1, 0,
         dt.datetime(2020, 1, 1, 9, 32)),
        ("k1", {}, "other", 0, 2, dt.datetime(2020, 1, 1, 9, 33)),
    ]
    wire = spark.createDataFrame(
        [(k.encode(), json.dumps(v).encode(), t, p, o, ts)
         for k, v, t, p, o, ts in rows],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )

    class Trade(csp.Struct):
        price: float
        size: int

    mgr = KafkaAdapterManager("broker:9092", source_df=wire)
    # keyed subscribe: only k1 ticks, kafka timestamp is engine time
    st = mgr.subscribe(Trade, JSONTextMessageMapper(), "trades", key="k1")
    ticks = st.collect_ticks("k1")
    assert [(t, v.price, v.size) for t, v in ticks] == [
        (dt.datetime(2020, 1, 1, 9, 30), 1.5, 3),
        (dt.datetime(2020, 1, 1, 9, 31), 2.5, 4),
    ]
    # wildcard subscribe sees every key on the topic, topic filter holds
    assert len(mgr.subscribe(
        Trade, JSONTextMessageMapper(), "trades").df.collect()) == 3
    # meta_field_map: kafka metadata lands in struct fields
    meta = mgr.subscribe(
        Trade, JSONTextMessageMapper(), "trades", key="k1",
        meta_field_map={"offset": "size"},
    ).collect_ticks("k1")
    assert [v.size for _, v in meta] == [0, 1]
    with pytest.raises(ValueError, match="unsupported meta field"):
        mgr.subscribe(Trade, JSONTextMessageMapper(), "trades",
                      meta_field_map={"nope": "size"})
    with pytest.raises(ValueError, match="cannot be used for both"):
        mgr.subscribe(Trade, JSONTextMessageMapper(), "trades",
                      meta_field_map={"timestamp": "ts"},
                      tick_timestamp_from_field="ts")
    # publish (batch form): key from struct field, payload is the JSON
    out = mgr.publish(
        JSONTextMessageMapper(), "out", "price",
        mgr.subscribe(Trade, JSONTextMessageMapper(), "trades", key="k1"),
    ).collect()
    assert [r.key for r in out] == ["1.5", "2.5"]
    assert json.loads(out[0].value) == {"price": 1.5, "size": 3}
    # status edge exists and is typed
    assert mgr.status() is not None


def test_dbreader_jdbc_sql_composition():
    """The JDBC pushdown path composes one subquery with inlined
    literals (spark.read.jdbc takes no bind params): time constraint,
    symbol filter, user constraint, ORDER BY — and escapes quotes."""
    from csp_spark.adapters.db import (
        DBReader, TimestampAccessor, _inline_params,
    )

    r = DBReader(
        "jdbc:postgresql://h/db", TimestampAccessor("ts"),
        table_name="prices", symbol_column="symbol",
        constraint=("price > ?", [10.5]),
    )
    sql, params = r._compose_sql("O'HARE")
    # requested cols = time + symbol before any subscribe() adds fields
    # (constraint columns need not be selected — WHERE sees the table)
    assert sql.startswith("SELECT symbol, ts FROM prices WHERE")
    assert "(symbol = ?)" in sql and "(price > ?)" in sql
    assert sql.endswith("ORDER BY ts")
    inlined = _inline_params(sql, params)
    assert "?" not in inlined
    assert "'O''HARE'" in inlined  # quote-escaped literal
    assert "10.5" in inlined

    # window binds inline as ISO timestamps inside a run frame
    def g():
        sql2, params2 = r._compose_sql(None)
        return _inline_params(sql2, params2)

    from csp_spark.plans.runtime import _run_info_stack

    _run_info_stack.append(
        {"start": dt.datetime(2020, 1, 1), "end": dt.datetime(2020, 1, 2),
         "realtime": False}
    )
    try:
        inlined = g()
    finally:
        _run_info_stack.pop()
    assert "BETWEEN '2020-01-01 00:00:00' AND '2020-01-02 00:00:00'" in inlined


def test_dbreader_reference_subscription_forms(spark):
    """The reference's own test scenario shapes (csp/tests/adapters/
    test_db.py test_sqlite_basic): struct, struct-with-field_map,
    scalar field, dynamic struct limited by field_map, dynamic struct
    resolved as a MODULE attribute, and subscribe_all — all in one
    windowed run."""
    import sqlite3

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    import csp.adapters.db as dbmod
    from csp.adapters.db import DBReader, TimestampAccessor

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE trades "
        "(TIME TEXT, SYMBOL TEXT, PRICE REAL, SIZE INTEGER, SIDE TEXT)"
    )
    conn.executemany("INSERT INTO trades VALUES (?,?,?,?,?)", [
        ("2020-03-03 09:30:00", "AAPL", 500.0, 100, "BUY"),
        ("2020-03-03 09:31:00", "AAPL", 400.0, 100, "BUY"),
        ("2020-03-03 09:32:00", "IBM", 20.0, 50, "SELL"),
        ("2020-03-03 09:33:00", "AAPL", 300.0, 200, "SELL"),
    ])
    conn.commit()

    class PQ(csp.Struct):
        PRICE: float
        SIZE: int

    class PQ2(csp.Struct):
        price: float
        quantity: int
        side: str

    def graph():
        reader = DBReader.create_from_connection(
            connection=conn,
            time_accessor=TimestampAccessor("TIME", tz="UTC"),
            table_name="trades",
            symbol_column="SYMBOL",
        )
        return {
            "aapl": reader.subscribe("AAPL", PQ),
            "aapl2": reader.subscribe(
                "AAPL", PQ2,
                field_map={"PRICE": "price", "SIZE": "quantity",
                           "SIDE": "side"},
            ),
            "aapl_price": reader.subscribe("AAPL", float, field_map="PRICE"),
            "aapl_dyn": reader.subscribe(
                "AAPL", None,
                field_map={"PRICE": "PRICE", "SIZE": "SIZE"},
            ),
            "all": reader.subscribe_all(PQ),
        }

    res = csp.run(
        graph,
        starttime=dt.datetime(2020, 3, 3, 9, 30),
        endtime=dt.datetime(2020, 3, 3, 10, 0),
    )
    assert [v.PRICE for _, v in res["aapl"]] == [500.0, 400.0, 300.0]
    assert [(v.price, v.quantity, v.side) for _, v in res["aapl2"]] == [
        (500.0, 100, "BUY"), (400.0, 100, "BUY"), (300.0, 200, "SELL"),
    ]
    assert [v for _, v in res["aapl_price"]] == [500.0, 400.0, 300.0]
    assert [(v.PRICE, v.SIZE) for _, v in res["aapl_dyn"]] == [
        (500.0, 100), (400.0, 100), (300.0, 200),
    ]
    assert len(res["all"]) == 4
    # dynamic struct resolves as a module attribute (reference
    # csp.adapters.db.DBDynStruct_{table}_{schema})
    S = getattr(dbmod, "DBDynStruct_trades_")
    assert S.__metadata__["PRICE"] is float and S.__metadata__["SIZE"] is int


def test_csvreader_delimiter_and_dbreader_join_query(spark, tmp_path):
    """Two more reference scenario shapes (csp/tests/adapters/
    test_csv.py delimiter='|'; test_db.py test_join_query): a
    pipe-delimited csv subscribe and a DBReader over a user JOIN
    query."""
    import sqlite3

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.csv import CSVReader, YYYYMMDD_TIME_formatter
    from csp.adapters.db import DBReader, TimestampAccessor

    path = str(tmp_path / "pipe.csv")
    with open(path, "w") as f:
        f.write("TIME|SYMBOL|PRICE\n")
        f.write("20200303 09:30:00|AAPL|500.0\n")
        f.write("20200303 09:31:00|IBM|20.0\n")
        f.write("20200303 09:32:00|AAPL|400.0\n")

    class P(csp.Struct):
        PRICE: float

    r = CSVReader(path, YYYYMMDD_TIME_formatter("TIME"),
                  delimiter="|", symbol_column="SYMBOL")
    assert [v.PRICE for _, v in
            r.subscribe("AAPL", P).collect_ticks("AAPL")] == [500.0, 400.0]

    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE px (ts TEXT, sid INTEGER, price REAL)")
    conn.execute("CREATE TABLE syms (sid INTEGER, symbol TEXT)")
    conn.executemany("INSERT INTO px VALUES (?,?,?)", [
        ("2020-03-03 09:30:00", 1, 500.0),
        ("2020-03-03 09:31:00", 2, 20.0),
        ("2020-03-03 09:32:00", 1, 400.0),
    ])
    conn.executemany("INSERT INTO syms VALUES (?,?)", [(1, "AAPL"), (2, "IBM")])
    conn.commit()
    rd = DBReader(
        conn, TimestampAccessor("ts", tz="UTC"),
        query="SELECT px.ts AS ts, syms.symbol AS symbol, px.price AS price "
              "FROM px JOIN syms ON px.sid = syms.sid",
        symbol_column="symbol",
    )

    class Q(csp.Struct):
        price: float

    assert [v.price for _, v in
            rd.subscribe("AAPL", Q).collect_ticks("AAPL")] == [500.0, 400.0]


def test_kafka_manager_offset_options():
    """start_offset -> Spark Kafka source options: EARLIEST/LATEST map
    directly, a datetime maps to startingTimestamp (epoch ms, naive =
    UTC), a timedelta offsets from the active run's starttime, and
    START_TIME resolves to the engine start."""
    import csp_spark

    csp_spark.enable_reference_alias()
    import pytest

    from csp.adapters.kafka import KafkaAdapterManager, KafkaStartOffset
    from csp_spark.plans.runtime import _run_info_stack

    def opts(**kw):
        return KafkaAdapterManager("b:9092", **kw)._offset_options()

    assert opts() == {"startingOffsets": "latest"}  # default LATEST
    assert opts(start_offset=KafkaStartOffset.EARLIEST) == {
        "startingOffsets": "earliest"}
    t0 = dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    assert opts(start_offset=dt.datetime(2020, 1, 1)) == {
        "startingTimestamp": str(int(t0.timestamp() * 1000))}
    # timedelta without a run frame is an error
    with pytest.raises(RuntimeError, match="starttime"):
        opts(start_offset=dt.timedelta(minutes=5))
    frame = {"start": dt.datetime(2020, 1, 1), "end": None,
             "realtime": True}
    _run_info_stack.append(frame)
    try:
        assert opts(start_offset=dt.timedelta(minutes=5)) == {
            "startingTimestamp": str(int(
                (t0 + dt.timedelta(minutes=5)).timestamp() * 1000))}
        assert opts(start_offset=KafkaStartOffset.START_TIME) == {
            "startingTimestamp": str(int(t0.timestamp() * 1000))}
    finally:
        _run_info_stack.pop()
    # START_TIME outside a run falls back to earliest (full replay)
    assert opts(start_offset=KafkaStartOffset.START_TIME) == {
        "startingOffsets": "earliest"}


def test_kafka_renaming_field_map_and_scalar(spark):
    """r10 review regressions: a RENAMING field_map must parse the
    WIRE field names (not the struct names), and the scalar
    subscription form must work with both JSON and raw mappers."""
    import json

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.kafka import KafkaAdapterManager
    from csp.adapters.utils import JSONTextMessageMapper, RawTextMessageMapper

    wire = spark.createDataFrame(
        [(b"k1", json.dumps({"px": 1.5, "sz": 3}).encode(), "t", 0, 0,
          dt.datetime(2020, 1, 1))],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )

    class Trade(csp.Struct):
        price: float
        size: int

    mgr = KafkaAdapterManager("b:9092", source_df=wire)
    st = mgr.subscribe(Trade, JSONTextMessageMapper(), "t",
                       field_map={"px": "price", "sz": "size"})
    assert [(v.price, v.size) for _, v in st.collect_ticks("k1")] == [
        (1.5, 3)]
    sc = mgr.subscribe(float, JSONTextMessageMapper(), "t", field_map="px")
    assert [v for _, v in sc.collect_ticks("k1")] == [1.5]
    rw = mgr.subscribe(str, RawTextMessageMapper(), "t")
    assert json.loads(rw.collect_ticks("k1")[0][1])["px"] == 1.5


def test_timestamp_accessor_tz_ignores_host_zone():
    """r10 review regression: the replay window converts naive engine
    times as UTC, never through the host machine's local zone."""
    import os
    import time as time_mod

    from csp_spark.adapters.db import DateTimeAccessor, TimestampAccessor

    prev = os.environ.get("TZ")
    os.environ["TZ"] = "America/Chicago"  # UTC-6 — would shift +6h
    time_mod.tzset()
    try:
        acc = TimestampAccessor("ts", tz="UTC")
        _, params = acc.get_time_constraint(
            dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2)
        )
        assert params == [dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2)]
        acc2 = DateTimeAccessor("d", "t", tz="UTC")
        _, params2 = acc2.get_time_constraint(
            dt.datetime(2020, 1, 1, 10), dt.datetime(2020, 1, 1, 12)
        )
        assert params2[1] == dt.time(10, 0) and params2[2] == dt.time(12, 0)
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        time_mod.tzset()


def test_dbreader_schema_struct_clear_errors():
    """r10 review regression: typ=None on query-based or jdbc-URL
    readers raises a clear error instead of a deep backend failure."""
    import sqlite3

    import pytest

    from csp_spark.adapters.db import DBReader, TimestampAccessor

    conn = sqlite3.connect(":memory:")
    with pytest.raises(RuntimeError, match="query-based reader"):
        DBReader(conn, TimestampAccessor("ts"),
                 query="SELECT 1 AS ts").schema_struct()
    with pytest.raises(RuntimeError, match="DB-API connection"):
        DBReader("jdbc:postgresql://h/db", TimestampAccessor("ts"),
                 table_name="t").schema_struct()


def test_dbreader_empty_window_yields_empty_stream(spark):
    """r11 ADVICE (high): a replay window / symbol with NO rows must
    yield an empty tick stream (the reference emits no ticks), not a
    CANNOT_INFER_EMPTY_SCHEMA crash from the empty pandas frame."""
    import sqlite3

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.db import DBReader, TimestampAccessor

    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE prices (ts TEXT, symbol TEXT, price REAL, size INTEGER)"
    )
    conn.execute(
        "INSERT INTO prices VALUES ('2020-06-01 10:00:00','AAPL',1.0,1)"
    )
    conn.commit()

    class Price(csp.Struct):
        price: float
        size: int

    def graph():
        reader = DBReader.create_from_connection(
            conn, TimestampAccessor("ts", tz="UTC"),
            table_name="prices", symbol_column="symbol",
        )
        return {
            "aapl": reader.subscribe("AAPL", Price),          # empty window
            "px": reader.subscribe("AAPL", float, field_map="price"),
            "none": reader.subscribe("NOSUCH", Price),        # empty symbol
        }

    # window entirely before the data: every subscription is empty
    res = csp.run(
        graph,
        starttime=dt.datetime(2020, 1, 1),
        endtime=dt.datetime(2020, 1, 2),
    )
    assert res["aapl"] == [] and res["px"] == [] and res["none"] == []
    # scalar subscription's empty frame still carries the scalar type
    def g2():
        reader = DBReader.create_from_connection(
            conn, TimestampAccessor("ts", tz="UTC"),
            table_name="prices", symbol_column="symbol",
        )
        return {"px": reader.subscribe("AAPL", float, field_map="price")}

    stream = None

    def g3():
        nonlocal stream
        out = g2()
        stream = out["px"]
        return out

    csp.run(g3, starttime=dt.datetime(2020, 1, 1),
            endtime=dt.datetime(2020, 1, 2))
    assert dict(stream.df.dtypes)["value"] == "double"


def test_csvreader_symbol_without_symbol_column_raises(spark, tmp_path):
    """r11 ADVICE (medium): subscribe(symbol) on a reader with no
    symbol_column must fail loudly (same guard as DBReader.subscribe)
    instead of mislabeling every row under that symbol."""
    from csp_spark.adapters.csv import CSVReader, YYYYMMDD_TIME_formatter

    path = str(tmp_path / "t.csv")
    with open(path, "w") as f:
        f.write("time,price\n20200101 09:30:00,1.0\n")
    reader = CSVReader(path, YYYYMMDD_TIME_formatter("time"))
    with pytest.raises(RuntimeError, match="no symbol column"):
        reader.subscribe("AAPL", float, field_map="price")
    # subscribe_all still works without a symbol column
    assert reader.subscribe_all(float, field_map="price").df.count() == 1


def test_csvreader_arbitrary_callable_time_converter(spark, tmp_path):
    """r11 ADVICE (low): the reference contract (csv.py:10-18) is ANY
    row callable -> datetime; a hand-written closure must work, not
    just the package's declarative _TimeConverter."""
    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.csv import CSVReader

    path = str(tmp_path / "t.csv")
    lines = [
        "epoch_min,symbol,price",
        "0,AAPL,100.0",
        "2,AAPL,101.0",
        "5,IBM,50.0",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    def my_converter(row):  # hand-written reference-style closure
        return dt.datetime(2020, 1, 1) + dt.timedelta(
            minutes=int(row["epoch_min"])
        )

    reader = CSVReader(path, my_converter, symbol_column="symbol")
    got = reader.subscribe("AAPL", float, field_map="price").collect_ticks(
        "AAPL"
    )
    assert got == [
        (dt.datetime(2020, 1, 1, 0, 0), 100.0),
        (dt.datetime(2020, 1, 1, 0, 2), 101.0),
    ]
    # non-callable still rejected with a clear error
    with pytest.raises(TypeError, match="callable"):
        CSVReader(path, 42, symbol_column="symbol").subscribe(
            "AAPL", float, field_map="price"
        )


def test_perspective_star_import_without_dep():
    """r11 ADVICE (low): `from csp.adapters.perspective import *` must
    work on a machine without perspective-python (View/Table stay
    resolvable via __getattr__, advertised in __all__ only when the
    optional dep imports)."""
    import csp_spark

    csp_spark.enable_reference_alias()
    ns: dict = {}
    exec("from csp.adapters.perspective import *", ns)
    assert "PerspectiveAdapter" in ns and "perspective_thread" in ns
    try:
        import perspective  # noqa: F401

        has_psp = True
    except ImportError:
        has_psp = False
    import csp.adapters.perspective as pmod

    assert (("View" in pmod.__all__) == has_psp)
    if not has_psp:
        assert "View" not in ns
        with pytest.raises(ImportError):
            exec("from csp.adapters.perspective import Table", {})


def test_dbreader_partitioned_jdbc_read(spark, tmp_path):
    """r11 verdict item 3: the JDBC backend's partitioned read path —
    N concurrent range scans against a REAL database (embedded Derby,
    whose driver ships in Spark's jars) must produce the same ticks in
    the same (ts, seq) order as the single-partition read, with the
    scan actually split N ways."""
    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.db import DBReader, TimestampAccessor

    url = f"jdbc:derby:{tmp_path}/pdb;create=true"
    jvm = spark._jvm
    jconn = jvm.java.sql.DriverManager.getConnection(url)
    st = jconn.createStatement()
    st.execute(
        "CREATE TABLE trades (ts TIMESTAMP, symbol VARCHAR(8), "
        "price DOUBLE, size INTEGER)"
    )
    rows = []
    for i in range(40):
        t = dt.datetime(2020, 1, 1, 9, 30) + dt.timedelta(minutes=i)
        sym = "AAPL" if i % 3 else "IBM"
        rows.append((t, sym, 100.0 + i, 10 * i))
        st.execute(
            f"INSERT INTO trades VALUES (TIMESTAMP('{t.isoformat(sep=' ')}')"
            f", '{sym}', {100.0 + i}, {10 * i})"
        )
    jconn.commit()

    class Trade(csp.Struct):
        price: float
        size: int

    def mk(n_parts):
        return DBReader(
            url, TimestampAccessor("ts", tz="UTC"),
            table_name="trades", symbol_column="symbol",
            num_partitions=n_parts,
            lower_bound=dt.datetime(2020, 1, 1, 9, 30),
            upper_bound=dt.datetime(2020, 1, 1, 10, 9),
        )

    # --- outside a run frame, explicit bounds: plan splits N ways
    single = mk(1).subscribe("AAPL", Trade)
    multi = mk(4).subscribe("AAPL", Trade)
    assert multi.df.rdd.getNumPartitions() == 4
    assert single.df.rdd.getNumPartitions() == 1
    s_ticks = [(t, v.price, v.size) for t, v in single.collect_ticks("AAPL")]
    m_ticks = [(t, v.price, v.size) for t, v in multi.collect_ticks("AAPL")]
    assert m_ticks == s_ticks and len(s_ticks) == 26
    # deterministic across re-reads: data-derived SEQ, not layout order
    again = [(t, v.price, v.size) for t, v in
             mk(4).subscribe("AAPL", Trade).collect_ticks("AAPL")]
    assert again == m_ticks
    # oracle: the rows straight off the cursor, time-ordered
    want = sorted(
        (t, p, s) for (t, sym, p, s) in rows if sym == "AAPL"
    )
    assert m_ticks == want

    # --- inside a run frame: bounds derive from the replay window
    def graph():
        reader = DBReader(
            url, TimestampAccessor("ts", tz="UTC"),
            table_name="trades", symbol_column="symbol",
            num_partitions=3,
        )
        return {"a": reader.subscribe("AAPL", Trade)}

    res = csp.run(
        graph,
        starttime=dt.datetime(2020, 1, 1, 9, 30),
        endtime=dt.datetime(2020, 1, 1, 9, 59),
    )
    in_window = [w for w in want
                 if w[0] <= dt.datetime(2020, 1, 1, 9, 59)]
    assert [(t, v.price, v.size) for t, v in res["a"]] == in_window

    # --- misuse guards
    from csp.adapters.db import DateTimeAccessor

    with pytest.raises(RuntimeError, match="partition_column"):
        DBReader(url, DateTimeAccessor("d", "t"), table_name="trades",
                 num_partitions=2)._resolve_partitioning()
    with pytest.raises(RuntimeError, match="lower_bound"):
        DBReader(url, TimestampAccessor("ts", tz="UTC"),
                 table_name="trades",
                 num_partitions=2)._resolve_partitioning()
    with pytest.raises(ValueError, match="together"):
        DBReader(url, TimestampAccessor("ts"), table_name="trades",
                 num_partitions=2, lower_bound=dt.datetime(2020, 1, 1))


def test_csv_db_runtime_impl_halves(spark, tmp_path):
    """r11: the managed-sim runtime halves (reference csv.py:49-113,
    db.py:312-440) — CSVReadAdapter/DBReadAdapter subscriptions driven
    by the shared timeslice loop match the Spark-scan subscribe path
    tick-for-tick, and SUBCLASSING the impl (the reason these classes
    are user-visible) customizes row handling."""
    import sqlite3

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.csv import (
        CSVReadAdapter, CSVReader, CSVReaderImpl, YYYYMMDD_TIME_formatter,
    )
    from csp.adapters.db import (
        DBReadAdapter, DBReader, DBReaderImpl, TimestampAccessor,
    )

    path = str(tmp_path / "rt.csv")
    lines = [
        "time,symbol,price,size",
        "20200101 09:30:00,AAPL,100.0,10",
        "20200101 09:31:00,AAPL,101.0,20",
        "20200101 09:31:00,IBM,50.0,5",
        "20200102 09:30:00,AAPL,102.0,30",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

    class Price(csp.Struct):
        price: float
        size: int

    st, en = dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 1, 23, 59)

    # --- CSV: runtime-half subscription == Spark-scan subscription
    def g_csv():
        r = CSVReader(path, YYYYMMDD_TIME_formatter("time"),
                      symbol_column="symbol")
        return {
            "rt": CSVReadAdapter(r, "AAPL", Price),
            "scan": r.subscribe("AAPL", Price),
            "all_rt": CSVReadAdapter(r, "", Price),  # reference "": all
        }

    res = csp.run(g_csv, starttime=st, endtime=en)
    as_tuples = lambda tks: [(t, v.price, v.size) for t, v in tks]
    assert as_tuples(res["rt"]) == as_tuples(res["scan"])
    assert len(res["all_rt"]) == 3
    # csv columns arrive as text; process_dict coerced per field type
    assert all(isinstance(v.price, float) and isinstance(v.size, int)
               for _, v in res["rt"])

    # --- DB: runtime-half subscription == DB-API Spark subscription
    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE prices (ts TEXT, symbol TEXT, price REAL, size INTEGER)"
    )
    conn.executemany(
        "INSERT INTO prices VALUES (?,?,?,?)",
        [("2020-01-01 09:30:00", "AAPL", 100.0, 10),
         ("2020-01-01 09:31:00", "AAPL", 101.0, 20),
         ("2020-01-01 09:31:00", "IBM", 50.0, 5),
         ("2020-01-02 09:30:00", "AAPL", 102.0, 30)],
    )
    conn.commit()

    def g_db():
        r = DBReader.create_from_connection(
            conn, TimestampAccessor("ts", tz="UTC"),
            table_name="prices", symbol_column="symbol",
        )
        return {
            "rt": DBReadAdapter(r, "AAPL", Price),
            "spark": r.subscribe("AAPL", Price),
        }

    res = csp.run(g_db, starttime=st, endtime=en)
    assert as_tuples(res["rt"]) == as_tuples(res["spark"]) and len(
        res["rt"]) == 2

    # --- the subclass path: a custom impl that upcases a column
    class ShoutingCSVReaderImpl(CSVReaderImpl):
        def process_row(self, row):
            row = dict(row, symbol=row["symbol"].lower())
            super().process_row(row)

    class ShoutingCSVReader(CSVReader):
        def _create(self, engine, memo):
            return ShoutingCSVReaderImpl(engine, self)

    class Tagged(csp.Struct):
        price: float
        symbol: str

    def g_sub():
        r = ShoutingCSVReader(path, YYYYMMDD_TIME_formatter("time"),
                              symbol_column="symbol")
        return {"x": CSVReadAdapter(r, "aapl", Tagged)}

    res = csp.run(g_sub, starttime=st, endtime=en)
    assert [v.symbol for _, v in res["x"]] == ["aapl", "aapl"]

    # jdbc-URL readers have no cursor for the driver-side impl half
    def g_bad():
        r = DBReader("jdbc:postgresql://h/db",
                     TimestampAccessor("ts", tz="UTC"),
                     table_name="prices", symbol_column="symbol")
        return {"x": DBReadAdapter(r, "AAPL", Price)}

    with pytest.raises(Exception, match="cursor|pushdown"):
        csp.run(g_bad, starttime=st, endtime=en)


def test_runtime_halves_review_fixes(spark, tmp_path):
    """r11 round-diff review regressions: tz-aware converters through
    the CSV runtime half, bool coercion from text rows, empty-symbol
    rows not double-delivered, the DB impl's symbol IN pushdown, and
    SQLAlchemy-engine cursor unwrapping."""
    import sqlite3
    import zoneinfo

    import csp_spark

    csp_spark.enable_reference_alias()
    import csp
    from csp.adapters.csv import CSVReadAdapter, CSVReader, time_converter
    from csp.adapters.db import DBReader, TimestampAccessor
    from csp.impl.adaptermanager import ManagedSimInputAdapter

    st, en = dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 2)

    # --- tz-aware converter: runtime half == Spark scan path (both
    # must land on the naive-UTC engine clock)
    path = str(tmp_path / "tz.csv")
    with open(path, "w") as f:
        f.write("time,symbol,price,is_open\n"
                "2020-01-01 04:30:00,AAPL,1.5,True\n"
                "2020-01-01 05:30:00,AAPL,2.5,False\n"
                ",,0.0,False\n".replace(",,", "2020-01-01 06:00:00,,"))
    ny = zoneinfo.ZoneInfo("America/New_York")
    conv = time_converter("time", "%Y-%m-%d %H:%M:%S", tz=ny)

    class Quote(csp.Struct):
        price: float
        is_open: bool

    def g():
        r = CSVReader(path, conv, symbol_column="symbol")
        return {
            "rt": CSVReadAdapter(r, "AAPL", Quote),
            "scan": r.subscribe("AAPL", Quote),
            "all": CSVReadAdapter(r, "", Quote),
        }

    res = csp.run(g, starttime=st, endtime=en)
    tup = lambda tks: [(t, v.price, v.is_open) for t, v in tks]
    assert tup(res["rt"]) == tup(res["scan"])
    # NY 04:30 local = 09:30 UTC; bool 'False' text parses as False
    assert tup(res["rt"]) == [
        (dt.datetime(2020, 1, 1, 9, 30), 1.5, True),
        (dt.datetime(2020, 1, 1, 10, 30), 2.5, False),
    ]
    # the empty-symbol row reaches subscribe_all exactly ONCE
    assert len(res["all"]) == 3

    # --- bool coercion rejects garbage loudly
    a = ManagedSimInputAdapter(bool, "b")
    with pytest.raises(ValueError, match="bool"):
        a.process_dict({"b": "maybe"})

    # --- DB symbol pushdown: explicit subscriptions compose IN (...)
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE p (ts TEXT, symbol TEXT, price REAL)")
    reader = DBReader.create_from_connection(
        conn, TimestampAccessor("ts", tz="UTC"),
        table_name="p", symbol_column="symbol",
    )
    reader._requested_cols.add("price")
    sql, params = reader._compose_sql(None, symbols=["AAPL", "IBM"])
    assert "symbol IN (?, ?)" in sql and params[-2:] == ["AAPL", "IBM"]

    # --- SQLAlchemy-engine-shaped connections unwrap to a DBAPI cursor
    class FakeEngine:  # sqlalchemy.Engine duck shape: no .cursor()
        def __init__(self, dbapi):
            self._dbapi = dbapi

        def raw_connection(self):
            return self._dbapi

    conn.execute("INSERT INTO p VALUES ('2020-01-01 10:00:00','AAPL',7.0)")
    conn.commit()

    class Px(csp.Struct):
        price: float

    from csp.adapters.db import DBReadAdapter

    def g2():
        r = DBReader.create_from_connection(
            FakeEngine(conn), TimestampAccessor("ts", tz="UTC"),
            table_name="p", symbol_column="symbol",
        )
        return {"x": DBReadAdapter(r, "AAPL", Px)}

    res2 = csp.run(g2, starttime=st, endtime=en)
    assert [(t, v.price) for t, v in res2["x"]] == [
        (dt.datetime(2020, 1, 1, 10, 0), 7.0)
    ]

    # --- mem_cache: user objects with arbitrary keys don't break stats
    from csp.impl.mem_cache import (
        CspGraphObjectsMemCache, GraphFunctionObjectKey,
    )

    c = CspGraphObjectsMemCache()
    with c:
        c.set_user_object(GraphFunctionObjectKey(func=g2, args=("u",)), 1)
        c._instantiated_objects["arbitrary"] = 2  # user-style key
        assert c.get_object_stats() == {"g2": 1}


def test_perspective_view_table_with_dep_present(monkeypatch):
    """The dep-PRESENT side of the View/Table gate (r10 verdict item 5
    asks for both ways): with a perspective module importable, the
    names resolve to ITS classes and join __all__ on a fresh import."""
    import importlib
    import sys
    import types

    import csp_spark

    csp_spark.enable_reference_alias()

    fake = types.ModuleType("perspective")

    class Table:  # stand-in for perspective-python's class
        pass

    class View:
        pass

    fake.Table, fake.View = Table, View
    monkeypatch.setitem(sys.modules, "perspective", fake)

    import csp.adapters.perspective as pmod

    # attribute access resolves through __getattr__ to the dep's class
    assert pmod.Table is Table and pmod.View is View
    ns: dict = {}
    exec("from csp.adapters.perspective import Table as T2", ns)
    assert ns["T2"] is Table
    # a fresh module import with the dep present advertises them
    fresh = importlib.reload(pmod)
    assert "View" in fresh.__all__ and "Table" in fresh.__all__
    # restore the real (dep-absent) module state for later tests
    monkeypatch.delitem(sys.modules, "perspective")
    importlib.reload(fresh)


def test_brownian_reference_signature_wires_without_spark_job(spark):
    """Wiring the reference-signature brownian_motion must not launch
    a Spark job (VERDICT r11 finding 3): const parameter edges are
    driver-born LocalRelations, folded locally; a cluster-backed
    parameter edge raises NotImplementedError WITHOUT executing its
    plan. Job-count is observed via a dedicated job group."""
    from csp_spark.operators.baselib import const, timer
    from csp_spark.random import brownian_motion

    start = dt.datetime(2024, 1, 1)
    end = start + dt.timedelta(seconds=4)
    trig = timer(spark, start, end, dt.timedelta(seconds=1))
    drift = const(spark, [0.0, 0.0], start, value_type="array<double>")
    cov = const(
        spark, [[0.01, 0.0], [0.0, 0.01]], start,
        value_type="array<array<double>>",
    )
    sc = spark.sparkContext
    sc.setJobGroup("bm_wire_nojob", "wiring must not run jobs")
    try:
        bm = brownian_motion(trig, drift=drift, covariance=cov, seed=5)
        with pytest.raises(NotImplementedError, match="time-varying"):
            # timer is a cluster plan (range+sequence) — must raise
            # structurally, not by scanning it
            brownian_motion(trig, drift=trig, covariance=cov, seed=5)
        jobs = sc.statusTracker().getJobIdsForGroup("bm_wire_nojob")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    assert list(jobs) == [], f"wiring launched Spark jobs: {jobs}"
    # the wired stream still runs correctly afterwards
    path = [v for _, v in bm.collect_ticks()]
    assert len(path) == 4 and len(path[0]) == 2


def test_const_fold_accepts_object_curves_and_caps_local_rows(spark):
    """Review follow-ups on the const-edge fold: (1) a driver-born
    object-typed curve (refcompat._curve_infer — not from_rows) also
    carries local_rows, so the reference brownian_motion signature
    accepts it without a Spark job; (2) big literal curves DROP
    local_rows (they are not pinned on the driver for life); (3) the
    kafka batch publish still accepts a plain value-only DataFrame."""
    import csp_spark
    from csp_spark.core.ticks import LOCAL_ROWS_CAP, TickStream
    from csp_spark.operators.baselib import timer
    from csp_spark.random import brownian_motion

    csp_spark.enable_reference_alias()
    import csp

    start = dt.datetime(2024, 1, 1)
    end = start + dt.timedelta(seconds=3)
    with csp_spark.engine_window(start, end):
        trig = timer(spark, start, end, dt.timedelta(seconds=1))
        drift = csp.curve(object, [(start, [0.0, 0.0])])
        cov = csp.curve(object, [(start, [[0.01, 0.0], [0.0, 0.01]])])
        sc = spark.sparkContext
        sc.setJobGroup("obj_curve_nojob", "const fold")
        bm = brownian_motion(trig, drift=drift, covariance=cov, seed=3)
        jobs = sc.statusTracker().getJobIdsForGroup("obj_curve_nojob")
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == []
    assert len(bm.collect_ticks()) == 3

    big = TickStream.from_rows(
        spark,
        [(start + dt.timedelta(seconds=i), float(i))
         for i in range(LOCAL_ROWS_CAP + 1)],
    )
    from csp_spark.core.ticks import LOCAL_ROWS_OVER_CAP

    assert big.local_rows == LOCAL_ROWS_OVER_CAP  # marker, not rows
    small = TickStream.from_rows(spark, [(start, 1.0)])
    assert isinstance(small.local_rows, tuple)

    # kafka publish, plain value-only frame (no ts/seq): bare wire
    from csp_spark.adapters.kafka import (
        JSONTextMessageMapper, KafkaAdapterManager,
    )
    from pyspark.sql import functions as F

    plain = spark.range(3).select(
        F.struct(F.col("id").cast("double").alias("px"),
                 F.lit("A").alias("sym")).alias("value"))
    wire = KafkaAdapterManager("b:9092").publish(
        JSONTextMessageMapper(), "t", "sym", plain)
    assert wire.columns == ["key", "value"] and wire.count() == 3
