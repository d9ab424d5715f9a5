"""Historical buffer access — csp's ``value_at / time_at / item_at /
values_at / times_at`` re-expressed as whole-stream window lookups.

Reference: csp/impl/builtin_functions.py:105-270 and
docs/wiki/concepts/Historical-Buffers.md. In csp these are node-local
calls that read a ring buffer at the node's current engine time; the
batch re-expression computes the SAME lookup at every tick of the
stream, so ``value_at(x, -3)`` is a stream whose value at each tick is
"the value 3 ticks ago" — what a node calling ``csp.value_at(x, -3)``
on every tick would observe.

Semantics deltas (documented, by design):
- out-of-range lookups yield ``default`` (NULL when unset) instead of
  raising — a per-row exception is not expressible in a vectorized
  plan, and the reference's ``default=`` form is the recommended one.
- only ``DuplicatePolicy.LAST_VALUE`` is supported (the reference
  supports nothing else either — builtin_functions.py:116).
- ``TimeIndexPolicy.EXTRAPOLATE`` (FORCE) is not supported.

Scale shape: every lookup is one window function over the existing
per-key partitioning — tick-index forms are ``lag``/``rowsBetween``
(zero extra shuffle beyond the stream's key partition), time-offset
forms ride a single union+running-last pass (the align kernel's
pattern), and absolute-time forms are one tiny per-key aggregate
joined back (AQE broadcasts it).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, TickStream

__all__ = [
    "value_at",
    "time_at",
    "item_at",
    "items_at",
    "values_at",
    "times_at",
    "with_lookups",
    "set_buffering_policy",
]

#: window-order within a key — engine order (ts, seq)
def _w(x: TickStream) -> Window:
    return Window.partitionBy(KEY).orderBy(TS, SEQ)


def _micros(c: Column) -> Column:
    return F.unix_micros(c)


def _td_micros(d: _dt.timedelta) -> int:
    return round(d.total_seconds() * 1_000_000)


def _lookup_cols(
    x: TickStream, index_or_time, vdefault: Any, tdefault: Any = None
) -> tuple[Column, Column]:
    """(value_col, ts_col) of the tick-index buffer lookup for each row.

    Used by value_at/time_at/item_at; the timedelta/datetime forms have
    their own entry points (they need a different plan shape).
    """
    v = F.col(x.value_col)
    if index_or_time is None:
        index_or_time = 0
    if isinstance(index_or_time, bool) or not isinstance(index_or_time, int):
        raise TypeError("index_or_time must be int/timedelta/datetime")
    k = -index_or_time
    if k < 0:
        raise ValueError("tick index must be non-positive")
    if k == 0:
        return v, F.col(TS)
    w = _w(x)
    return (
        F.lag(v, k, vdefault).over(w),
        F.lag(F.col(TS), k, tdefault).over(w),
    )


def value_at(
    x: TickStream,
    index_or_time: int | _dt.timedelta | _dt.datetime | None = 0,
    default: Any = None,
) -> TickStream:
    """csp.value_at parity (builtin_functions.py:105-137): at every tick
    of ``x``, the value at tick-index ``-k`` / time offset ``-d`` /
    absolute time ``t``. Out-of-range → ``default``."""
    if isinstance(index_or_time, _dt.timedelta):
        return _at_time_offset(x, index_or_time, default, want="value")
    if isinstance(index_or_time, _dt.datetime):
        return _at_absolute(x, index_or_time, default, want="value")
    vcol, _ = _lookup_cols(x, index_or_time, default)
    return TickStream(x.df.select(KEY, TS, SEQ, vcol.alias("value")))


def time_at(
    x: TickStream,
    index_or_time: int | _dt.timedelta | _dt.datetime | None = 0,
    default: Any = None,
) -> TickStream:
    """csp.time_at parity (builtin_functions.py:140-174): the TIMESTAMP
    of the tick the lookup resolves to."""
    if isinstance(index_or_time, _dt.timedelta):
        return _at_time_offset(x, index_or_time, default, want="ts")
    if isinstance(index_or_time, _dt.datetime):
        return _at_absolute(x, index_or_time, default, want="ts")
    _, tcol = _lookup_cols(x, index_or_time, None, default)
    return TickStream(x.df.select(KEY, TS, SEQ, tcol.alias("value")))


def item_at(
    x: TickStream,
    index_or_time: int | _dt.timedelta | _dt.datetime | None = 0,
    default: Any = None,
) -> TickStream:
    """csp.item_at parity: struct(ts, value) of the resolved tick."""
    if isinstance(index_or_time, (_dt.timedelta, _dt.datetime)):
        t = time_at(x, index_or_time, None)
        v = value_at(x, index_or_time, default)
        joined = t.df.select(
            KEY, TS, SEQ, F.col("value").alias("__t")
        ).join(
            v.df.select(KEY, TS, SEQ, F.col("value").alias("__v")),
            [KEY, TS, SEQ],
        )
        return TickStream(
            joined.select(
                KEY, TS, SEQ,
                F.struct(
                    F.col("__t").alias("ts"), F.col("__v").alias("value")
                ).alias("value"),
            )
        )
    vcol, tcol = _lookup_cols(x, index_or_time, default)
    return x.with_df(
        x.df.select(
            KEY, TS, SEQ,
            F.struct(tcol.alias("ts"), vcol.alias("value")).alias("value"),
        ),
        "value",
    )


def _at_time_offset(
    x: TickStream, d: _dt.timedelta, default: Any, want: str
) -> TickStream:
    """As-of lookup at ts+d (d ≤ 0) for every tick: union probe rows
    (shifted to their lookup time) with source rows, one running
    ``last`` over (key, micros, tag, seq) — source-before-probe at
    equal instants makes the boundary INCLUSIVE, and seq order within a
    timestamp realizes LAST_VALUE without a dedup pass. Single key
    shuffle, the align kernel's cost shape."""
    dm = _td_micros(d)
    if dm > 0:
        raise ValueError("time offset must be non-positive")
    df = x.df
    v = F.col(x.value_col)
    src = df.select(
        F.col(KEY),
        _micros(F.col(TS)).alias("__m"),
        F.lit(0).alias("__tag"),
        F.col(SEQ),
        v.alias("__sv"),
        _micros(F.col(TS)).alias("__st"),
        F.lit(None).cast("timestamp").alias("__pts"),
    )
    probe = df.select(
        F.col(KEY),
        (_micros(F.col(TS)) + F.lit(dm)).alias("__m"),
        F.lit(1).alias("__tag"),
        F.col(SEQ),
        F.lit(None).cast(dict(df.dtypes)[x.value_col]).alias("__sv"),
        F.lit(None).cast("long").alias("__st"),
        F.col(TS).alias("__pts"),
    )
    u = src.unionByName(probe)
    w = (
        Window.partitionBy(KEY)
        .orderBy("__m", "__tag", SEQ)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = u.select(
        KEY, SEQ, "__tag", "__pts",
        F.last("__sv", ignorenulls=True).over(w).alias("__rv"),
        F.last("__st", ignorenulls=True).over(w).alias("__rt"),
    ).filter(F.col("__tag") == 1)
    out_val = (
        F.coalesce(F.timestamp_micros(F.col("__rt")),
                   F.lit(default).cast("timestamp"))
        if want == "ts"
        else F.coalesce(F.col("__rv"), F.lit(default))
    )
    return TickStream(
        resolved.select(
            KEY, F.col("__pts").alias(TS), SEQ, out_val.alias("value")
        )
    )


def _at_absolute(
    x: TickStream, t: _dt.datetime, default: Any, want: str
) -> TickStream:
    """Lookup at a FIXED time for every row: one per-key max_by
    aggregate over ticks ≤ t, joined back (tiny build side — AQE
    broadcasts it)."""
    df = x.df
    look = (
        df.filter(F.col(TS) <= F.lit(t))
        .groupBy(KEY)
        .agg(
            F.max_by(
                F.struct(F.col(TS).alias("t"), F.col(x.value_col).alias("v")),
                F.struct(F.col(TS), F.col(SEQ)),
            ).alias("__hit")
        )
    )
    joined = df.join(look, KEY, "left")
    out_val = (
        F.coalesce(F.col("__hit.t"), F.lit(default).cast("timestamp"))
        if want == "ts"
        else F.coalesce(F.col("__hit.v"), F.lit(default))
    )
    return TickStream(joined.select(KEY, TS, SEQ, out_val.alias("value")))


def _range_frame(
    x: TickStream, start, end, start_policy: str, end_policy: str
) -> tuple[Window, bool]:
    """Window frame for values_at/times_at. Returns (window, use_struct):
    tick-index bounds ride rowsBetween on the engine order; timedelta
    bounds ride rangeBetween on micros (use_struct=True → caller
    collects sortable structs because range frames allow only one
    ordering expression)."""
    for p in (start_policy, end_policy):
        if p not in ("inclusive", "exclusive"):
            raise ValueError(
                f"policy {p!r} not supported (EXTRAPOLATE/FORCE is a "
                "ring-buffer-only affordance)"
            )
    kinds = {type(b) for b in (start, end) if b is not None}
    if _dt.timedelta in kinds:
        lo = Window.unboundedPreceding if start is None else _td_micros(start)
        hi = 0 if end is None else _td_micros(end)
        if start is not None:
            if lo > 0:
                raise ValueError("start offset must be non-positive")
            if start_policy == "exclusive":
                lo += 1
        if end is not None and end_policy == "exclusive":
            hi -= 1
        w = (
            Window.partitionBy(KEY)
            .orderBy(_micros(F.col(TS)))
            .rangeBetween(lo, hi)
        )
        return w, True
    if start is not None and (start > 0 or (end is not None and start > end)):
        raise ValueError("bad tick-index range")
    if end is not None and end > 0:
        raise ValueError("tick indices must be non-positive")
    lo = Window.unboundedPreceding if start is None else start
    hi = 0 if end is None else end
    w = Window.partitionBy(KEY).orderBy(TS, SEQ).rowsBetween(lo, hi)
    return w, False


def values_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str = "inclusive",
    end_policy: str = "inclusive",
) -> TickStream:
    """csp.values_at parity (builtin_functions.py:200-232): at every
    tick, the ARRAY of buffered values between the two bounds (both
    ≤ 0; None = unbounded start / current end), ascending time order."""
    w, use_struct = _range_frame(x, start, end, start_policy, end_policy)
    v = F.col(x.value_col)
    if use_struct:
        arr = F.array_sort(
            F.collect_list(
                F.struct(_micros(F.col(TS)).alias("m"), F.col(SEQ).alias("s"),
                         v.alias("v"))
            ).over(w)
        )
        out = F.transform(arr, lambda e: e["v"])
    else:
        out = F.collect_list(v).over(w)
    return TickStream(x.df.select(KEY, TS, SEQ, out.alias("value")))


def times_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str = "inclusive",
    end_policy: str = "inclusive",
) -> TickStream:
    """csp.times_at parity: the ARRAY of tick TIMESTAMPS in range."""
    w, use_struct = _range_frame(x, start, end, start_policy, end_policy)
    if use_struct:
        arr = F.array_sort(
            F.collect_list(
                F.struct(_micros(F.col(TS)).alias("m"), F.col(SEQ).alias("s"))
            ).over(w)
        )
        out = F.transform(arr, lambda e: F.timestamp_micros(e["m"]))
    else:
        out = F.collect_list(F.col(TS)).over(w)
    return TickStream(x.df.select(KEY, TS, SEQ, out.alias("value")))


def items_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str = "inclusive",
    end_policy: str = "inclusive",
) -> TickStream:
    """csp.items_at parity (builtin_functions.py:250-270): at every
    tick, the ARRAY of (ts, value) STRUCTS in range — the zipped form
    of (times_at, values_at), ascending time order."""
    w, use_struct = _range_frame(x, start, end, start_policy, end_policy)
    v = F.col(x.value_col)
    if use_struct:
        arr = F.array_sort(
            F.collect_list(
                F.struct(_micros(F.col(TS)).alias("m"), F.col(SEQ).alias("s"),
                         v.alias("v"))
            ).over(w)
        )
        out = F.transform(
            arr,
            lambda e: F.struct(
                F.timestamp_micros(e["m"]).alias("ts"), e["v"].alias("value")
            ),
        )
    else:
        out = F.collect_list(
            F.struct(F.col(TS).alias("ts"), v.alias("value"))
        ).over(w)
    return TickStream(x.df.select(KEY, TS, SEQ, out.alias("value")))


def with_lookups(x: TickStream, specs: dict[str, tuple]):
    """Several tick-index buffer lookups as COLUMNS of one frame.

    A node body typically reads the buffer more than once per tick
    (e.g. lag-3 value, lag-2 time, last-5 window). Composing the
    single-lookup streams with equality joins costs one shuffle per
    lookup plus the joins (measured: 14 exchanges for 4 lookups);
    every tick-index form is just a window function over the SAME
    (key | ts, seq) partition, so this computes them side by side in
    one select — ONE exchange total, any number of lookups.

    specs: name -> ("value_at", k) | ("time_at", k) | ("item_at", k)
    | ("values_at", lo, hi) | ("times_at", lo, hi) |
    ("items_at", lo, hi); tick indices only (ints ≤ 0). Time-offset /
    absolute forms need a different plan shape — use value_at/time_at
    and join their stream. Returns the tick frame (key, ts, seq,
    <name>...).
    """
    cols: list[Column] = [F.col(KEY), F.col(TS), F.col(SEQ)]
    for name, spec in specs.items():
        kind, *args = spec
        if any(isinstance(a, (_dt.timedelta, _dt.datetime)) for a in args):
            raise TypeError(
                f"{name}: with_lookups takes tick indices only; use "
                "value_at/time_at for time-offset forms and join"
            )
        if kind in ("value_at", "time_at", "item_at"):
            vcol, tcol = _lookup_cols(x, args[0] if args else 0, None)
            c = {
                "value_at": vcol,
                "time_at": tcol,
                "item_at": F.struct(tcol.alias("ts"), vcol.alias("value")),
            }[kind]
        elif kind in ("values_at", "times_at", "items_at"):
            start = args[0] if len(args) > 0 else None
            end = args[1] if len(args) > 1 else None
            w, _ = _range_frame(x, start, end, "inclusive", "inclusive")
            v = F.col(x.value_col)
            c = {
                "values_at": F.collect_list(v).over(w),
                "times_at": F.collect_list(F.col(TS)).over(w),
                "items_at": F.collect_list(
                    F.struct(F.col(TS).alias("ts"), v.alias("value"))
                ).over(w),
            }[kind]
        else:
            raise ValueError(f"unknown lookup kind {kind!r}")
        cols.append(c.alias(name))
    return x.df.select(*cols)


def set_buffering_policy(
    x: TickStream,
    tick_count: int | None = None,
    tick_history: _dt.timedelta | None = None,
) -> TickStream:
    """csp.set_buffering_policy parity (builtin_functions.py:75-102):
    in csp this pre-sizes the input ring buffer so historical reads
    don't fall off the end. Spark window frames DECLARE their history
    window in the plan (rowsBetween/rangeBetween), so the engine sizes
    state automatically — this is a validated no-op kept for API
    parity and porting ergonomics."""
    if tick_count is not None and tick_count < 1:
        raise ValueError("tick_count must be >= 1")
    if tick_history is not None and tick_history <= _dt.timedelta(0):
        raise ValueError("tick_history must be positive")
    return x
