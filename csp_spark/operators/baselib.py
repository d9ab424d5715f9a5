"""csp.baselib parity — per-tick streaming transforms as DataFrame ops.

Each function mirrors one reference operator (cited file:line into
/root/reference — csp/baselib.py unless noted) but is implemented
Spark-first: column expressions and window functions over the tick
table, never row-at-a-time Python. All ops preserve the (key, ts, seq)
engine-order discipline (SURVEY.md §2.8).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Iterable, Mapping, NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.align import SRC, align, binary_op, sample
from ..core.ticks import GLOBAL_KEY, KEY, SEQ, TS, VALUE, TickStream

__all__ = [
    "const", "timer", "curve", "null_ts", "filter_", "sample", "firstN",
    "count", "delay", "diff", "merge", "split", "cast_int_to_float",
    "drop_dups", "drop_nans", "unroll", "collect", "flatten", "gate",
    "default", "accum", "exprtk", "times", "times_ns", "apply_",
    "multiplex", "demultiplex", "struct_field", "struct_fromts",
    "struct_collectts",
]


# ----------------------------------------------------------------------
# sources (csp.const / csp.timer / csp.curve — SURVEY.md §2.1)
# ----------------------------------------------------------------------

def const(
    spark: SparkSession,
    value: Any,
    start: _dt.datetime,
    delay: _dt.timedelta | None = None,
    value_type: str = "double",
    key: str = GLOBAL_KEY,
) -> TickStream:
    """csp.const (baselib.py:73; ConstInputAdapter.h): one tick at
    start(+delay). Batch mode needs the engine start time explicitly."""
    ts = start + (delay or _dt.timedelta(0))
    return TickStream.from_rows(spark, [(ts, value)], value_type, key=key)


def timer(
    spark: SparkSession,
    start: _dt.datetime,
    end: _dt.datetime,
    interval: _dt.timedelta,
    value: Any = True,
    value_type: str = "boolean",
    key: str = GLOBAL_KEY,
) -> TickStream:
    """csp.timer (baselib.py:74-83): periodic ticks. Batch: a generated
    time grid via sequence()+explode — pure JVM, no driver loop."""
    step_us = (interval // _dt.timedelta(microseconds=1))
    df = spark.range(1).select(
        F.lit(key).alias(KEY),
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {step_us} MICROSECONDS"),
            )
        ).alias(TS),
        F.lit(0).cast("long").alias(SEQ),
        F.lit(value).cast(value_type).alias(VALUE),
    )
    # csp.timer first fires at start+interval, not at start
    df = df.filter(F.col(TS) > F.lit(start))
    return TickStream(df)


def curve(
    spark: SparkSession,
    data,
    value_type: str = "double",
    key: str = GLOBAL_KEY,
    start: _dt.datetime | None = None,
) -> TickStream:
    """csp.curve (csp/curve.py:16-65): replay explicit (time, value)s.

    Accepts the reference's three input forms: a list of
    ``(datetime, value)`` tuples; a list of ``(timedelta, value)``
    tuples resolved against ``start`` (the reference resolves against
    the engine start time — here it must be passed); or the numpy fast
    path ``(times_array, values_array)`` (reference ``_npcurve``)."""
    if (
        isinstance(data, tuple)
        and len(data) == 2
        and hasattr(data[0], "dtype")
    ):
        import pandas as pd

        times = pd.to_datetime(data[0]).to_pydatetime().tolist()
        vals = data[1].tolist()
        data = list(zip(times, vals))
    else:
        data = list(data)
    if data and isinstance(data[0][0], _dt.timedelta):
        if start is None:
            raise ValueError(
                "timedelta-based curve data needs start= (the reference "
                "resolves offsets against the engine start time)"
            )
        data = [(start + td, v) for td, v in data]
    return TickStream.from_rows(spark, data, value_type, key=key)


def null_ts(spark: SparkSession, value_type: str = "double") -> TickStream:
    """csp.null_ts (baselib.py:544-551): never ticks."""
    schema = (
        f"{KEY} string, {TS} timestamp, {SEQ} long, {VALUE} {value_type}"
    )
    return TickStream(spark.createDataFrame([], schema))


# ----------------------------------------------------------------------
# filters / projections
# ----------------------------------------------------------------------

def filter_(flag: TickStream, x: TickStream) -> TickStream:
    """csp.filter (baselib.py:412-420): pass x ticks while the *last*
    value of flag is true — an as-of gate, not an equi-join."""
    from ..core.wiring import require_boolean

    require_boolean(flag, "filter", "flag")
    a = align({"__flag": flag, "__x": x})
    out = a.filter(
        F.col("__x__ticked") & (F.col("__flag") == F.lit(True))
    ).select(KEY, TS, SEQ, F.col("__x").alias(VALUE))
    return TickStream(out)


def firstN(x: TickStream, n: int) -> TickStream:
    """csp.firstN (baselib.py:301-314)."""
    w = Window.partitionBy(KEY).orderBy(TS, SEQ)
    out = (
        x.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return x.with_df(out)


def count(x: TickStream) -> TickStream:
    """csp.count (baselib.py:317-321): running tick count."""
    w = (
        Window.partitionBy(KEY)
        .orderBy(TS, SEQ)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = x.df.select(
        KEY, TS, SEQ, F.count(F.lit(1)).over(w).alias(VALUE)
    )
    return TickStream(out)


def delay(x: TickStream, by: _dt.timedelta | int) -> TickStream:
    """csp.delay (baselib.py:324-352): shift events later by a duration
    (timestamps move) or by tick count (values shift down the stream)."""
    if isinstance(by, _dt.timedelta):
        us = (by // _dt.timedelta(microseconds=1))
        out = x.df.withColumn(
            TS, F.col(TS) + F.expr(f"INTERVAL {us} MICROSECONDS")
        )
        return x.with_df(out)
    w = Window.partitionBy(KEY).orderBy(TS, SEQ)
    out = (
        x.df.withColumn("__v", F.lag(x.value_col, by).over(w))
        .filter(F.col("__v").isNotNull())
        .select(KEY, TS, SEQ, F.col("__v").alias(x.value_col))
    )
    return x.with_df(out)


def diff(x: TickStream, lag: int | _dt.timedelta = 1) -> TickStream:
    """csp.diff (baselib.py:356-367): x - x.lagged. Time-based lag uses
    the as-of value at (ts - lag)."""
    if isinstance(lag, int):
        w = Window.partitionBy(KEY).orderBy(TS, SEQ)
        prev = F.lag(x.value_col, lag).over(w)
        out = (
            x.df.withColumn("__p", prev)
            .filter(F.col("__p").isNotNull())
            .select(KEY, TS, SEQ, (F.col(x.value_col) - F.col("__p")).alias(VALUE))
        )
        return TickStream(out)
    # reference form: x - sample(x, delay(x, lag)) — the lagged side
    # ticks ONLY on x's own cycles (sample re-times it), so no output
    # fires at t+lag where x itself did not tick
    shifted = delay(x, lag)
    lagged = sample(x, shifted)
    return binary_op(x, lagged, lambda a, b: a - b)


def merge(x: TickStream, y: TickStream) -> TickStream:
    """csp.merge (baselib.py:370-376): union; left wins when both tick on
    the same engine cycle (same (ts, seq))."""
    from ..core.wiring import require_compatible

    require_compatible(x, y, "merge")
    xs = x.df.select(KEY, TS, SEQ, F.col(x.value_col).alias(VALUE)).withColumn(
        "__pri", F.lit(0)
    )
    ys = y.df.select(KEY, TS, SEQ, F.col(y.value_col).alias(VALUE)).withColumn(
        "__pri", F.lit(1)
    )
    w = Window.partitionBy(KEY, TS, SEQ).orderBy("__pri")
    out = (
        xs.unionByName(ys)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(KEY, TS, SEQ, VALUE)
    )
    return TickStream(out)


class _SplitOutput(NamedTuple):
    # attribute access matches the reference's named node outputs
    # (``csp.split(...).true`` / ``.false``, baselib.py:379); tuple
    # unpacking keeps working for existing callers
    true: TickStream
    false: TickStream


def split(flag: TickStream, x: TickStream) -> _SplitOutput:
    """csp.split (baselib.py:379-389): route to (true, false) streams.
    Both sides share one aligned plan (Spark reuses the exchange)."""
    a = align({"__flag": flag, "__x": x})
    base = a.filter(F.col("__x__ticked") & F.col("__flag").isNotNull())
    t = base.filter(F.col("__flag")).select(KEY, TS, SEQ, F.col("__x").alias(VALUE))
    f = base.filter(~F.col("__flag")).select(KEY, TS, SEQ, F.col("__x").alias(VALUE))
    return _SplitOutput(TickStream(t), TickStream(f))


def cast_int_to_float(x: TickStream) -> TickStream:
    """csp.cast_int_to_float (baselib.py:392-396)."""
    return x.with_df(x.df.withColumn(x.value_col, F.col(x.value_col).cast("double")))


def drop_dups(x: TickStream, eps: float | None = None) -> TickStream:
    """csp.drop_dups (baselib.py:424-454): drop consecutive duplicates;
    float mode treats |a-b| < eps as equal and NaN==NaN."""
    w = Window.partitionBy(KEY).orderBy(TS, SEQ)
    prev = F.lag(x.value_col).over(w)
    cur = F.col(x.value_col)
    if eps is not None:
        same = (
            (F.isnan(cur) & F.isnan(prev))
            | (~F.isnan(cur) & ~F.isnan(prev) & (F.abs(cur - prev) < F.lit(eps)))
        )
    else:
        same = cur.eqNullSafe(prev) | (
            F.isnan(cur) & F.isnan(prev)
            if dict(x.df.dtypes)[x.value_col] in ("double", "float")
            else F.lit(False)
        )
    out = (
        x.df.withColumn("__same", F.coalesce(same, F.lit(False)))
        .filter(~F.col("__same"))
        .drop("__same")
    )
    return x.with_df(out)


def drop_nans(x: TickStream) -> TickStream:
    """csp.drop_nans (baselib.py:457-461): remove NaN ticks (NaN, not
    NULL — SURVEY.md §7.4 item 7)."""
    return x.with_df(x.df.filter(~F.isnan(F.col(x.value_col))))


def unroll(x: TickStream) -> TickStream:
    """csp.unroll (baselib.py:464-484): explode a list tick into
    per-element ticks at the same timestamp on successive engine cycles
    → posexplode, then re-derive a dense seq per (key, ts)."""
    out = x.df.select(
        KEY, TS, SEQ, F.posexplode(F.col(x.value_col)).alias("__pos", VALUE)
    )
    w = Window.partitionBy(KEY, TS).orderBy(SEQ, "__pos")
    out = out.select(
        KEY,
        TS,
        (F.row_number().over(w).cast("long") - 1).alias(SEQ),
        VALUE,
    )
    return TickStream(out)


def collect(streams: Mapping[str, TickStream] | TickStream) -> TickStream:
    """csp.collect (baselib.py:487-492): ticked values at each engine
    cycle → one list tick. Long-format: groupBy (key, ts, seq) gathering
    values ordered by stream position."""
    if isinstance(streams, TickStream):
        df = streams.df.select(
            KEY, TS, SEQ, F.col(streams.value_col).alias(VALUE), F.lit(0).alias(SRC)
        )
    else:
        parts = [
            s.df.select(
                KEY, TS, SEQ, F.col(s.value_col).alias(VALUE), F.lit(i).alias(SRC)
            )
            for i, s in enumerate(streams.values())
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
    out = (
        df.groupBy(KEY, TS, SEQ)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(SRC), F.col(VALUE)))
            ).alias("__sv")
        )
        .select(
            KEY, TS, SEQ,
            F.transform(F.col("__sv"), lambda s: s[VALUE]).alias(VALUE),
        )
    )
    return TickStream(out)


def burst(x: TickStream) -> TickStream:
    """PushMode.BURST emulation (csp/impl/types/common_definitions.py:
    274-289; SURVEY.md §2.1): conflate all same-timestamp ticks of a
    stream into one list tick, ordered by engine cycle (seq)."""
    out = (
        x.df.groupBy(KEY, TS)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(SEQ), F.col(x.value_col).alias(VALUE)))
            ).alias("__sv")
        )
        .select(
            KEY, TS, F.lit(0).cast("long").alias(SEQ),
            F.transform(F.col("__sv"), lambda s: s[VALUE]).alias(VALUE),
        )
    )
    return TickStream(out)


def last_value(x: TickStream) -> TickStream:
    """PushMode.LAST_VALUE emulation (csp/impl/types/common_definitions
    .py:274-289; Execution-Modes.md:41-52): when several ticks share one
    engine timestamp (conflated backlog), only the latest (max seq)
    survives. Counterpart of burst(); NON_COLLAPSING is the default
    (keep every seq)."""
    w = Window.partitionBy(KEY, TS).orderBy(F.desc(SEQ))
    out = (
        x.df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return x.with_df(out)


def flatten(streams: Iterable[TickStream]) -> TickStream:
    """csp.flatten (baselib.py:494-503): interleave streams; ties keep
    every tick (distinct cycles) ordered by stream position."""
    streams = list(streams)
    parts = [
        s.df.select(KEY, TS, SEQ, F.col(s.value_col).alias(VALUE)).withColumn(
            "__pri", F.lit(i)
        )
        for i, s in enumerate(streams)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    w = Window.partitionBy(KEY, TS).orderBy(SEQ, "__pri")
    out = df.select(
        KEY, TS, (F.row_number().over(w).cast("long") - 1).alias(SEQ), VALUE
    )
    return TickStream(out)


def gate(x: TickStream, release: TickStream, release_on_tick: bool = False) -> TickStream:
    """csp.gate (baselib.py:507-522): buffer x while the gate is closed
    (last release value false); when it opens, flush the buffer as one
    list tick; while open, each tick passes as a single-element list.

    Batch realization: each x tick is assigned its flush row — itself if
    the gate was open at its (ts, seq), else the next release tick that
    opens the gate — then one groupBy gathers the lists.

    ``release_on_tick=True`` (reference: ``not release_on_tick or
    csp.ticked(release)``) flushes ONLY on cycles where release itself
    ticks true: x ticks buffer even while the gate sits open, and the
    flush row is always the next opening release tick.
    """
    from ..core.wiring import require_boolean

    require_boolean(release, "gate", "release")
    a = align({"__rel": release, "__x": x})
    wfwd = (
        Window.partitionBy(KEY)
        .orderBy(F.col(TS).desc(), F.col(SEQ).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    open_now = F.col("__rel") == F.lit(True)
    opens_here = F.col("__rel__ticked") & open_now
    a2 = a.withColumn(
        "__next_open",
        F.last(
            F.when(opens_here, F.struct(F.col(TS), F.col(SEQ))), ignorenulls=True
        ).over(wfwd),
    )
    xrows = a2.filter(F.col("__x__ticked"))
    if release_on_tick:
        flush = F.col("__next_open")
    else:
        flush = F.when(open_now, F.struct(F.col(TS), F.col(SEQ))).otherwise(
            F.col("__next_open")
        )
    xrows = xrows.withColumn("__flush", flush).filter(F.col("__flush").isNotNull())
    out = (
        xrows.groupBy(KEY, F.col("__flush"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(TS), F.col(SEQ), F.col("__x")))
            ).alias("__sv")
        )
        .select(
            KEY,
            F.col(f"__flush.{TS}").alias(TS),
            F.col(f"__flush.{SEQ}").alias(SEQ),
            F.transform(F.col("__sv"), lambda s: s["__x"]).alias(VALUE),
        )
    )
    return TickStream(out)


def default(
    x: TickStream,
    value: Any,
    start: _dt.datetime,
    delay: _dt.timedelta | None = None,
    keys: Iterable[str] | None = None,
) -> TickStream:
    """csp.default (baselib.py:525-532): synthetic initial value at
    start(+delay) unless x already ticked at-or-before it.

    ``keys``: the key set to seed. Defaults to the keys OBSERVED in
    ``x`` — which means a stream that never ticks yields no default
    row (the long format carries no key universe of its own; the
    reference's unkeyed edge always fires its default). Pass the key
    list explicitly (e.g. ``[GLOBAL_KEY]`` for unkeyed streams) when
    the default must fire for keys x may never tick."""
    at = start + (delay or _dt.timedelta(0))
    first_w = Window.partitionBy(KEY)
    if keys is not None:
        spark = x.df.sparkSession
        keys = spark.createDataFrame(
            [(str(k),) for k in keys], f"{KEY} string"
        )
    else:
        keys = x.df.select(KEY).distinct()
    defaults = keys.select(
        KEY,
        F.lit(at).cast("timestamp").alias(TS),
        F.lit(-1).cast("long").alias(SEQ),
        F.lit(value).cast(dict(x.df.dtypes)[x.value_col]).alias(VALUE),
    )
    xs = x.df.select(KEY, TS, SEQ, F.col(x.value_col).alias(VALUE))
    u = xs.unionByName(defaults)
    u = u.withColumn("__min_ts", F.min(F.when(F.col(SEQ) >= 0, F.col(TS))).over(first_w))
    out = u.filter(
        (F.col(SEQ) >= 0) | (F.col("__min_ts").isNull()) | (F.col("__min_ts") > F.lit(at))
    ).drop("__min_ts")
    return TickStream(out)


def accum(x: TickStream, start: float = 0.0) -> TickStream:
    """csp.accum (baselib.py:615-622): running sum + initial value."""
    w = (
        Window.partitionBy(KEY)
        .orderBy(TS, SEQ)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = x.df.select(
        KEY, TS, SEQ, (F.sum(x.value_col).over(w) + F.lit(start)).alias(VALUE)
    )
    return TickStream(out)


def exprtk(aligned: DataFrame, expr_str: str, result: str = VALUE) -> DataFrame:
    """csp.exprtk (baselib.py:625-673) — a C++ ExprTk JIT in the
    reference; Spark SQL expressions ARE our JIT (Catalyst codegen)."""
    return aligned.withColumn(result, F.expr(expr_str))


def times(x: TickStream) -> TickStream:
    """csp.times (baselib.py:744-751): tick → its timestamp."""
    return TickStream(x.df.select(KEY, TS, SEQ, F.col(TS).alias(VALUE)))


def times_ns(x: TickStream) -> TickStream:
    """csp.times_ns (baselib.py:753-757): epoch nanoseconds (Spark
    timestamps are µs resolution; we scale — documented delta)."""
    return TickStream(
        x.df.select(KEY, TS, SEQ, (F.unix_micros(F.col(TS)) * 1000).alias(VALUE))
    )


def apply_(x: TickStream, fn: Callable, result_type: str = "double") -> TickStream:
    """csp.apply (baselib.py:399-409). Row-at-a-time Python — the slow
    path by design; prefer column expressions / exprtk. Kept for parity.
    useArrow batches the transfer (Arrow) even though fn itself is
    per-row — ~3-5x less serialization overhead than pickled rows."""
    udf = F.udf(fn, result_type, useArrow=True)
    return x.with_df(x.df.withColumn(x.value_col, udf(F.col(x.value_col))))


# ----------------------------------------------------------------------
# baskets (SURVEY.md §1.1, §2.3 multiplex/demultiplex)
# ----------------------------------------------------------------------

def multiplex(x: TickStream, key_stream: TickStream) -> TickStream:
    """csp.multiplex (baselib.py:554-580) over the long-format basket
    encoding: ``x`` is a keyed stream (key column = basket key); emit
    x ticks whose key equals the *last* value of ``key_stream``.

    key_stream is unkeyed (GLOBAL_KEY); we broadcast-join its as-of
    value onto x's timeline."""
    sel = key_stream.df.select(
        F.col(TS).alias("__kts"), F.col(SEQ).alias("__kseq"),
        F.col(key_stream.value_col).alias("__sel"),
    )
    w = (
        Window.partitionBy(KEY)
        .orderBy(TS, SEQ, F.col("__is_x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    xs = x.df.select(KEY, TS, SEQ, F.col(x.value_col).alias(VALUE)).withColumn(
        "__is_x", F.lit(1)
    )
    # replicate selector rows into every basket key partition: selector is
    # tiny (a control stream) → broadcast cross join with distinct keys
    keys = x.df.select(KEY).distinct()
    sel_rep = keys.crossJoin(F.broadcast(sel)).select(
        KEY, F.col("__kts").alias(TS), F.col("__kseq").alias(SEQ),
        F.lit(None).cast(dict(x.df.dtypes)[x.value_col]).alias(VALUE),
        F.lit(0).alias("__is_x"), F.col("__sel"),
    )
    xs = xs.withColumn("__sel", F.lit(None).cast(dict(sel.dtypes)["__sel"]))
    u = xs.unionByName(sel_rep)
    u = u.withColumn("__cur", F.last("__sel", ignorenulls=True).over(w))
    out = u.filter(
        (F.col("__is_x") == 1) & (F.col("__cur") == F.col(KEY))
    ).select(KEY, TS, SEQ, VALUE)
    return TickStream(out)


def dynamic_collect(x: TickStream) -> TickStream:
    """csp.dynamic_collect (baselib.py:608-612): the ticked entries of a
    dynamic basket per engine cycle → one map tick. Long format: the
    basket IS the key column, so this is a coincident groupBy(ts, seq)
    gathering (key → value) entries."""
    out = (
        x.df.groupBy(TS, SEQ)
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col(KEY), F.col(x.value_col)))
                )
            ).alias(VALUE)
        )
        .select(F.lit(GLOBAL_KEY).alias(KEY), TS, SEQ, VALUE)
    )
    return TickStream(out)


def demultiplex(
    x: TickStream, keys: list[str], raise_on_bad_key: bool = False
) -> dict[str, TickStream]:
    """csp.demultiplex (baselib.py:583-595): route a keyed stream to
    per-key outputs. In the long format this is just filters sharing one
    scan; dynamic_demultiplex (baselib.py:600-604) is the identity —
    Spark is already keyed. ``raise_on_bad_key`` mirrors the reference
    node's runtime check: a tick whose key is outside ``keys`` raises
    at execution (in-expression, same pattern as dynamic_cast)."""
    route = F.col(KEY)
    if raise_on_bad_key:
        route = F.when(
            ~F.col(KEY).isin([str(k) for k in keys]),
            F.raise_error(
                F.concat(F.lit("demultiplex: unrecognized key "), F.col(KEY))
            ),
        ).otherwise(F.col(KEY))
    return {
        k: TickStream(x.df.filter(route == k), x.value_col) for k in keys
    }


def dynamic_demultiplex(x: TickStream, key=None, raise_on_bad_key: bool = False):
    """csp.dynamic_demultiplex (baselib.py:600-604): route a stream into
    a DYNAMIC basket keyed by a key stream's coincident value — keys
    are discovered from the data, not declared. In the long format the
    result is one re-keyed stream (key column = the key stream's value
    at each tick); csp.dynamic() instantiates per-key subgraphs over
    it, and a dict-basket node input iterates its keys.

    Key-less/list forms keep the static demultiplex behavior."""
    if key is None:
        return TickStream(x.df, x.value_col)
    if isinstance(key, (list, tuple, set)):
        return demultiplex(x, list(key), raise_on_bad_key)
    from ..core.align import align

    a = align({"__v": x, "__k": key})
    from ..core.align import _ticked as _tick_col

    df = a.filter(
        F.col(_tick_col("__v")) & F.col("__k").isNotNull()
    ).select(
        F.col("__k").cast("string").alias(KEY),
        TS, SEQ,
        F.col("__v").alias(VALUE),
    )
    return TickStream(df, VALUE)


# ----------------------------------------------------------------------
# structs (csp.Struct → StructType — SURVEY.md §1.2)
# ----------------------------------------------------------------------

def struct_field(x: TickStream, field: str) -> TickStream:
    """csp.struct_field (baselib.py:676-681): project one field,
    skipping ticks where it is unset (NULL)."""
    out = (
        x.df.select(KEY, TS, SEQ, F.col(f"{x.value_col}.{field}").alias(VALUE))
        .filter(F.col(VALUE).isNotNull())
    )
    return TickStream(out)


def struct_fromts(fields: Mapping[str, TickStream], trigger: TickStream | None = None) -> TickStream:
    """csp.struct_fromts (baselib.py:684-701): struct of the last values
    of each input, emitted on any tick (or on trigger).

    Field names ride internal channels so reference structs whose
    fields shadow the engine columns (a ``key``/``ts``/``seq`` field,
    e.g. e2_websocket_output's MyData.key) align cleanly."""
    names = list(fields)
    streams = {f"__f{i}": s for i, s in enumerate(fields.values())}
    if trigger is not None:
        streams["__trigger"] = trigger
    a = align(streams)
    if trigger is not None:
        a = a.filter(F.col("__trigger__ticked"))
    out = a.select(
        KEY, TS, SEQ,
        F.struct(
            *[F.col(f"__f{i}").alias(n) for i, n in enumerate(names)]
        ).alias(VALUE),
    )
    return TickStream(out)


def struct_collectts(fields: Mapping[str, TickStream]) -> TickStream:
    """csp.struct_collectts (baselib.py:704-709): struct of values that
    ticked on this exact engine cycle (coincident join on (key,ts,seq));
    absent fields are NULL/unset."""
    parts = []
    names = list(fields)
    # internal channel names: a field named key/ts/seq must not shadow
    # the engine columns (same treatment as struct_fromts)
    chan = [f"__f{i}" for i in range(len(names))]
    srcs = list(fields.values())
    for i, s in enumerate(srcs):
        cols = [F.col(KEY), F.col(TS), F.col(SEQ)]
        for j, other in enumerate(srcs):
            typ = dict(other.df.dtypes)[other.value_col]
            cols.append(
                (F.col(s.value_col) if j == i else F.lit(None).cast(typ)).alias(chan[j])
            )
        parts.append(s.df.select(*cols))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    out = (
        df.groupBy(KEY, TS, SEQ)
        .agg(*[F.first(c, ignorenulls=True).alias(c) for c in chan])
        .select(
            KEY, TS, SEQ,
            F.struct(
                *[F.col(c).alias(n) for c, n in zip(chan, names)]
            ).alias(VALUE),
        )
    )
    return TickStream(out)


# ----------------------------------------------------------------------
# casts / basket field access / delayed wiring (reference baselib tail)
# ----------------------------------------------------------------------

def static_cast(x: TickStream, to_type: str) -> TickStream:
    """csp.static_cast (baselib.py:761-772): re-type without runtime
    checking — a pure Catalyst ``cast``, free inside codegen. Caller
    asserts validity, exactly like the reference's unchecked Edge
    retype."""
    return x.with_df(
        x.df.withColumn(x.value_col, F.col(x.value_col).cast(to_type))
    )


def dynamic_cast(x: TickStream, to_type: str) -> TickStream:
    """csp.dynamic_cast (baselib.py:776-780): checked re-type — any
    value the cast cannot represent raises AT RUN TIME (the reference
    runs values through a node for runtime type checking). JVM-side:
    the error branch lives in the value expression, so no UDF and no
    extra pass."""
    src = F.col(x.value_col)
    casted = src.cast(to_type)
    out = x.df.withColumn(
        x.value_col,
        F.when(src.isNull(), casted)
        .when(casted.isNotNull(), casted)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"dynamic_cast to {to_type} failed for value: "),
                    src.cast("string"),
                )
            ).cast(to_type)
        ),
    )
    return x.with_df(out)


def get_basket_field(basket, field: str):
    """csp.get_basket_field (baselib.py:586-598): from a basket of
    structs, the per-member time series of one field (ticks where the
    field is set). Two basket encodings:

    - a DICT basket ({key: stream} — csp.dynamic results, basket node
      outputs): per-member struct_field, returning the same dict shape
      (the reference's OutputBasket(..., shape_of='dict_basket') form);
    - a long-format KEYED stream: struct_field with the key column
      preserved — which it already is (KEY rides through every op)."""
    if isinstance(basket, dict):
        return {k: struct_field(s, field) for k, s in basket.items()}
    return struct_field(basket, field)


def wrap_feedback(x: TickStream) -> TickStream:
    """csp.wrap_feedback (baselib.py:713-731): mark a stream as a
    feedback re-injection. The reference's feedback delivers the bound
    value one ENGINE CYCLE later at the same timestamp; in the
    (ts, seq) model that is exactly seq+1 — same time, ordered after
    the producing cycle, so coincident-join ops (collect,
    struct_collectts) correctly see it as a separate cycle."""
    return x.with_df(x.df.withColumn(SEQ, F.col(SEQ) + F.lit(1)))


class DelayedDemultiplex:
    """csp.DelayedDemultiplex (baselib.py:783-815): demux a fat pipe by
    keys requested AFTER the object is built. DataFrames are lazy
    plans, so the 'delayed' wiring is natural: each demultiplex(key)
    is a filter over the shared keyed stream — one scan, Catalyst
    merges the branches. The routing key is the stream's KEY column
    by default; pass a ``key`` stream to route by its as-of value
    instead (the reference's ts[K] routing input)."""

    def __init__(
        self,
        x: TickStream,
        key: TickStream | None = None,
        raise_on_bad_key: bool = False,
    ):
        if key is None:
            self._routed = x
        else:
            a = align({"__v": x, "__k": key})
            self._routed = TickStream(
                a.filter(F.col("__v__ticked") & F.col("__k").isNotNull())
                .select(
                    KEY, TS, SEQ,
                    F.col("__k").alias("__route"),
                    F.col("__v").alias(VALUE),
                ),
                VALUE,
            )
        self._by_key_col = key is not None
        self._raise = raise_on_bad_key
        self._requested: list = []

    def demultiplex(self, key) -> TickStream:
        col = F.col("__route") if self._by_key_col else F.col(KEY)
        self._requested.append(key)
        df = self._routed.df.filter(col == F.lit(key))
        if self._by_key_col:
            df = df.drop("__route")
        return TickStream(df, self._routed.value_col)

    def unclaimed(self) -> TickStream:
        """Ticks routed to a key NO demultiplex() call claimed. With
        ``raise_on_bad_key`` the stream RAISES at execution on its
        first such tick (in-expression, the dynamic_cast pattern) —
        the delayed analog of the reference node's runtime check.
        Call after all demultiplex() calls (the reference's delayed
        node also resolves at end of wiring) and attach it to the run
        (csp.add_graph_output) so the check executes."""
        col = F.col("__route") if self._by_key_col else F.col(KEY)
        df = self._routed.df.filter(
            ~col.isin([F.lit(k) for k in self._requested])
        )
        if self._raise:
            df = df.withColumn(
                VALUE,
                F.raise_error(
                    F.concat(
                        F.lit("demultiplex: unrecognized key "),
                        col.cast("string"),
                    )
                ),
            )
        if self._by_key_col:
            df = df.drop("__route")
        return TickStream(df, self._routed.value_col)


class DelayedCollect:
    """csp.DelayedCollect (baselib.py:818-850): accumulate inputs from
    many publish sites, then produce the single merged basket stream.
    ``output()`` is csp's ts[List[T]]: the per-cycle collect of all
    registered inputs."""

    def __init__(self):
        self._inputs: list[TickStream] = []

    def add_input(self, x: TickStream) -> None:
        self._inputs.append(x)

    def output(self) -> TickStream:
        if not self._inputs:
            raise ValueError("DelayedCollect.output() with no inputs")
        return collect({str(i): s for i, s in enumerate(self._inputs)})
