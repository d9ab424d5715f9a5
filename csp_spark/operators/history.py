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
  supports nothing else either — builtin_functions.py:116; FIRST_VALUE
  raises, exactly like the reference engine).

``TimeIndexPolicy``: INCLUSIVE / EXCLUSIVE / EXTRAPOLATE on the
time-offset range forms, matching the reference engine
(cpp/csp/python/PyInputProxy.cpp computeStartIndex/computeEndIndex +
NumpyConversions.h adjustStartAndEndTime):
- EXTRAPOLATE start = the as-of tick at the start boundary (last tick
  at or before start) is PREPENDED to the in-range ticks; its
  timestamp is clamped forward to the boundary in times_at/items_at.
- EXTRAPOLATE end = when the last in-range tick is strictly before the
  end boundary, it is DUPLICATED as a tail pad; the pad's timestamp is
  clamped to the end boundary in times_at/items_at.
- integer tick-index bounds support INCLUSIVE only (the reference
  raises for the others on integer indexing — PyInputProxy.cpp:272).

Scale shape: every lookup is one window function over the existing
per-key partitioning — tick-index forms are ``lag``/``rowsBetween``
(zero extra shuffle beyond the stream's key partition), time-offset
forms ride a single union+running-last pass (the align kernel's
pattern), and absolute-time forms are one tiny per-key aggregate
joined back (AQE broadcasts it).
"""

from __future__ import annotations

import datetime as _dt
from enum import IntEnum
from typing import Any

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ..core.enum import Enum as _CspEnum
from ..core.ticks import KEY, SEQ, TS, TickStream

__all__ = [
    "DuplicatePolicy",
    "TimeIndexPolicy",
    "value_at",
    "time_at",
    "item_at",
    "items_at",
    "values_at",
    "times_at",
    "with_lookups",
    "set_buffering_policy",
]


class TimeIndexPolicy(_CspEnum):
    """Reference csp/impl/types/autogen_types.py:26 — boundary policy
    for values_at/times_at/items_at."""

    INCLUSIVE = 1
    EXCLUSIVE = 2
    EXTRAPOLATE = 3


class DuplicatePolicy(IntEnum):
    """Reference csp/impl/types/common_definitions.py:304 — same-time
    tick selection for value_at/time_at/item_at. Only LAST_VALUE is
    supported (like the reference engine)."""

    LAST_VALUE = 1
    FIRST_VALUE = 2


def _policy(p) -> str:
    """Normalize a TimeIndexPolicy member / name string."""
    if isinstance(p, TimeIndexPolicy):
        return p.name.lower()
    if isinstance(p, str) and p.lower() in (
        "inclusive", "exclusive", "extrapolate",
    ):
        return p.lower()
    raise ValueError(f"unknown TimeIndexPolicy {p!r}")


def _check_duplicate_policy(duplicate_policy) -> None:
    if duplicate_policy not in (
        DuplicatePolicy.LAST_VALUE, int(DuplicatePolicy.LAST_VALUE),
    ):
        raise NotImplementedError(
            "only DuplicatePolicy.LAST_VALUE is supported (the "
            "reference engine supports nothing else either)"
        )

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
    duplicate_policy: int = DuplicatePolicy.LAST_VALUE,
    default: Any = None,
) -> TickStream:
    """csp.value_at parity (builtin_functions.py:105-137): at every tick
    of ``x``, the value at tick-index ``-k`` / time offset ``-d`` /
    absolute time ``t``. Out-of-range → ``default``."""
    _check_duplicate_policy(duplicate_policy)
    if isinstance(index_or_time, _dt.timedelta):
        return _at_time_offset(x, index_or_time, default, want="value")
    if isinstance(index_or_time, _dt.datetime):
        return _at_absolute(x, index_or_time, default, want="value")
    vcol, _ = _lookup_cols(x, index_or_time, default)
    return TickStream(x.df.select(KEY, TS, SEQ, vcol.alias("value")))


def time_at(
    x: TickStream,
    index_or_time: int | _dt.timedelta | _dt.datetime | None = 0,
    duplicate_policy: int = DuplicatePolicy.LAST_VALUE,
    default: Any = None,
) -> TickStream:
    """csp.time_at parity (builtin_functions.py:140-174): the TIMESTAMP
    of the tick the lookup resolves to."""
    _check_duplicate_policy(duplicate_policy)
    if isinstance(index_or_time, _dt.timedelta):
        return _at_time_offset(x, index_or_time, default, want="ts")
    if isinstance(index_or_time, _dt.datetime):
        return _at_absolute(x, index_or_time, default, want="ts")
    _, tcol = _lookup_cols(x, index_or_time, None, default)
    return TickStream(x.df.select(KEY, TS, SEQ, tcol.alias("value")))


def item_at(
    x: TickStream,
    index_or_time: int | _dt.timedelta | _dt.datetime | None = 0,
    duplicate_policy: int = DuplicatePolicy.LAST_VALUE,
    default: Any = None,
) -> TickStream:
    """csp.item_at parity: struct(ts, value) of the resolved tick."""
    _check_duplicate_policy(duplicate_policy)
    if isinstance(index_or_time, (_dt.timedelta, _dt.datetime)):
        t = time_at(x, index_or_time, default=None)
        v = value_at(x, index_or_time, default=default)
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


def _is_td_range(start, end) -> bool:
    return _dt.timedelta in {type(b) for b in (start, end) if b is not None}


def _range_frame(
    x: TickStream, start, end, start_policy: str, end_policy: str
) -> tuple[Window, bool]:
    """Window frame for values_at/times_at. Returns (window, use_struct):
    tick-index bounds ride rowsBetween on the engine order; timedelta
    bounds ride rangeBetween on micros (use_struct=True → caller
    collects sortable structs because range frames allow only one
    ordering expression). EXTRAPOLATE has its own plan — _td_structs.
    Tie note: timedelta frames are value-range, so a lookup from an
    early cycle of a shared (key, microsecond) sees the whole
    microsecond (end-of-µs state), not buffer-so-far; the per-cycle
    causal encoding (stats.rolling.causal_time_window) is the fix if a
    caller needs sub-microsecond cycle fidelity here too."""
    if _is_td_range(start, end):
        for p in (start_policy, end_policy):
            if p not in ("inclusive", "exclusive"):
                raise ValueError(f"policy {p!r} must route via _td_structs")
        lo = Window.unboundedPreceding if start is None else _td_micros(start)
        hi = 0 if end is None else _td_micros(end)
        if start is not None:
            if lo > 0:
                raise ValueError("start offset must be non-positive")
            if start_policy == "exclusive":
                lo += 1
        if end is not None and end_policy == "exclusive":
            hi -= 1
        if start is not None and lo > hi:
            # exclusive adjustments crossed the bounds (e.g. start ==
            # end with an exclusive side): the window is EMPTY by
            # construction — signal the caller (a frame with lower >
            # upper is invalid SQL)
            return None, True
        w = (
            Window.partitionBy(KEY)
            .orderBy(_micros(F.col(TS)))
            .rangeBetween(lo, hi)
        )
        return w, True
    # integer tick-index bounds: the reference supports INCLUSIVE only
    # here (PyInputProxy.cpp:272 raises for any other policy)
    for p in (start_policy, end_policy):
        if p != "inclusive":
            raise ValueError(
                f"Unsupported time index policy for integer indexing: {p}"
            )
    if start is not None and (start > 0 or (end is not None and start > end)):
        raise ValueError("bad tick-index range")
    if end is not None and end > 0:
        raise ValueError("tick indices must be non-positive")
    lo = Window.unboundedPreceding if start is None else start
    hi = 0 if end is None else end
    w = Window.partitionBy(KEY).orderBy(TS, SEQ).rowsBetween(lo, hi)
    return w, False


def _past_only(arr: Column) -> Column:
    """Drop elements from engine cycles AFTER the current row: a range
    frame on micros cannot see ``seq``, so a tick sharing this row's
    timestamp but ticking on a LATER cycle would leak into the buffer.
    Element-level filter on (m, s) ≤ (current m, current s) restores
    the (ts, seq) cycle order the ring buffer observes."""
    cm, cs = _micros(F.col(TS)), F.col(SEQ)
    return F.filter(
        arr,
        lambda e: (e["m"] < cm) | ((e["m"] == cm) & (e["s"] <= cs)),
    )


def _td_structs(
    x: TickStream, start, end, start_policy: str, end_policy: str
) -> tuple[Column, Column | None, Column | None]:
    """Sorted (m, s, v) struct array for a timedelta range under any
    TimeIndexPolicy pair. Returns (array, clamp_lo, clamp_hi) where the
    clamps are the per-row boundary micros to clamp the first/last
    element's TIMESTAMP to (None unless that side is EXTRAPOLATE) —
    times_at/items_at apply them, values_at ignores them.

    EXTRAPOLATE plan shape (reference PyInputProxy computeStart/EndIndex
    + NumpyConversions tailPadding): the main frame collects ticks
    STRICTLY after the start boundary; one extra windowed max_by fetches
    the as-of tick AT the boundary and prepends it; the end pad
    duplicates the final element when it falls short of the end
    boundary. Still one keyed shuffle — the extra aggregate shares the
    same window partition."""
    v = F.col(x.value_col)
    e_struct = F.struct(
        _micros(F.col(TS)).alias("m"), F.col(SEQ).alias("s"), v.alias("v")
    )
    lo = Window.unboundedPreceding if start is None else _td_micros(start)
    hi = 0 if end is None else _td_micros(end)
    if start is not None and lo > 0:
        raise ValueError("start offset must be non-positive")
    if start_policy in ("exclusive", "extrapolate") and start is not None:
        main_lo = lo + 1
    else:
        main_lo = lo
    main_hi = hi - 1 if (end is not None and end_policy == "exclusive") else hi
    # Window.unboundedPreceding is a huge negative long, so a plain
    # comparison classifies it as non-degenerate correctly
    degenerate = isinstance(main_lo, int) and main_lo > main_hi
    if degenerate:
        # empty-by-construction main window (boundary adjustments
        # crossed): a one-element array sliced to length 0 keeps the
        # struct type; carry/pad still apply on top
        arr = F.slice(F.array(e_struct), 1, 0)
    else:
        w_main = (
            Window.partitionBy(KEY)
            .orderBy(_micros(F.col(TS)))
            .rangeBetween(main_lo, main_hi)
        )
        arr = _past_only(
            F.array_sort(F.collect_list(e_struct).over(w_main))
        )

    clamp_lo = clamp_hi = None
    if start_policy == "extrapolate" and start is not None:
        # as-of carry: LAST tick at-or-before the start boundary
        # (LAST_VALUE among same-time duplicates via (m, s) max_by)
        w_carry = (
            Window.partitionBy(KEY)
            .orderBy(_micros(F.col(TS)))
            .rangeBetween(Window.unboundedPreceding, lo)
        )
        carry = F.max_by(
            e_struct, F.struct(F.col(TS), F.col(SEQ))
        ).over(w_carry)
        keep = carry.isNotNull()
        if end is not None and end_policy == "exclusive":
            # zero-width window edge (start == end): the carried tick
            # can sit exactly AT the end boundary, and end-EXCLUSIVE
            # must still drop it — the end policy applies to the raw
            # tick time, carry included (hypothesis-found r9)
            keep = keep & (carry["m"] < _micros(F.col(TS)) + F.lit(hi))
        arr = F.when(keep, F.concat(F.array(carry), arr)).otherwise(arr)
        clamp_lo = _micros(F.col(TS)) + F.lit(lo)
    if end_policy == "extrapolate":
        end_abs = _micros(F.col(TS)) + F.lit(hi)
        last = F.element_at(arr, -1)
        arr = F.when(
            (F.size(arr) > 0) & (last["m"] < end_abs),
            F.concat(arr, F.array(last)),
        ).otherwise(arr)
        clamp_hi = end_abs
    return arr, clamp_lo, clamp_hi


def _clamped_ts(
    arr: Column, clamp_lo: Column | None, clamp_hi: Column | None
):
    """Element-timestamp expression applying the EXTRAPOLATE boundary
    clamps (reference NumpyConversions.h adjustStartAndEndTime: first
    element forward to the start boundary, last element forward to the
    end boundary, in that order)."""
    n = F.size(arr)

    def ts_of(e, i):
        m = e["m"]
        if clamp_lo is not None:
            m = F.when((i == F.lit(0)) & (m < clamp_lo), clamp_lo).otherwise(m)
        if clamp_hi is not None:
            m = F.when(
                (i == n - F.lit(1)) & (m < clamp_hi), clamp_hi
            ).otherwise(m)
        return F.timestamp_micros(m)

    return ts_of


def values_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str | TimeIndexPolicy = "inclusive",
    end_policy: str | TimeIndexPolicy = "inclusive",
) -> TickStream:
    """csp.values_at parity (builtin_functions.py:200-232): at every
    tick, the ARRAY of buffered values between the two bounds (both
    ≤ 0; None = unbounded start / current end), ascending time order.
    EXTRAPOLATE prepends the as-of carry / duplicates the tail pad."""
    sp, ep = _policy(start_policy), _policy(end_policy)
    v = F.col(x.value_col)
    if _is_td_range(start, end) and "extrapolate" in (sp, ep):
        arr, _, _ = _td_structs(x, start, end, sp, ep)
        out = F.transform(arr, lambda e: e["v"])
    else:
        w, use_struct = _range_frame(x, start, end, sp, ep)
        es = F.struct(_micros(F.col(TS)).alias("m"),
                      F.col(SEQ).alias("s"), v.alias("v"))
        if use_struct:
            arr = (
                F.slice(F.array(es), 1, 0) if w is None
                else _past_only(F.array_sort(F.collect_list(es).over(w)))
            )
            out = F.transform(arr, lambda e: e["v"])
        else:
            out = F.collect_list(v).over(w)
    return TickStream(x.df.select(KEY, TS, SEQ, out.alias("value")))


def times_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str | TimeIndexPolicy = "inclusive",
    end_policy: str | TimeIndexPolicy = "inclusive",
) -> TickStream:
    """csp.times_at parity: the ARRAY of tick TIMESTAMPS in range.
    EXTRAPOLATE clamps the boundary elements' timestamps to the window
    edges (reference adjustStartAndEndTime)."""
    sp, ep = _policy(start_policy), _policy(end_policy)
    if _is_td_range(start, end) and "extrapolate" in (sp, ep):
        arr, clamp_lo, clamp_hi = _td_structs(x, start, end, sp, ep)
        ts_of = _clamped_ts(arr, clamp_lo, clamp_hi)
        out = F.transform(arr, ts_of)
    else:
        w, use_struct = _range_frame(x, start, end, sp, ep)
        es = F.struct(_micros(F.col(TS)).alias("m"),
                      F.col(SEQ).alias("s"))
        if use_struct:
            arr = (
                F.slice(F.array(es), 1, 0) if w is None
                else _past_only(F.array_sort(F.collect_list(es).over(w)))
            )
            out = F.transform(arr, lambda e: F.timestamp_micros(e["m"]))
        else:
            out = F.collect_list(F.col(TS)).over(w)
    return TickStream(x.df.select(KEY, TS, SEQ, out.alias("value")))


def items_at(
    x: TickStream,
    start: int | _dt.timedelta | None = None,
    end: int | _dt.timedelta | None = None,
    start_policy: str | TimeIndexPolicy = "inclusive",
    end_policy: str | TimeIndexPolicy = "inclusive",
) -> TickStream:
    """csp.items_at parity (builtin_functions.py:250-270): at every
    tick, the ARRAY of (ts, value) STRUCTS in range — the zipped form
    of (times_at, values_at), ascending time order. EXTRAPOLATE clamps
    the boundary timestamps, values carry/pad unclamped."""
    sp, ep = _policy(start_policy), _policy(end_policy)
    v = F.col(x.value_col)
    if _is_td_range(start, end) and "extrapolate" in (sp, ep):
        arr, clamp_lo, clamp_hi = _td_structs(x, start, end, sp, ep)
        ts_of = _clamped_ts(arr, clamp_lo, clamp_hi)
        out = F.transform(
            arr,
            lambda e, i: F.struct(
                ts_of(e, i).alias("ts"), e["v"].alias("value")
            ),
        )
    else:
        w, use_struct = _range_frame(x, start, end, sp, ep)
        es = F.struct(_micros(F.col(TS)).alias("m"),
                      F.col(SEQ).alias("s"), v.alias("v"))
        if use_struct:
            arr = (
                F.slice(F.array(es), 1, 0) if w is None
                else _past_only(F.array_sort(F.collect_list(es).over(w)))
            )
            out = F.transform(
                arr,
                lambda e: F.struct(
                    F.timestamp_micros(e["m"]).alias("ts"),
                    e["v"].alias("value"),
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
