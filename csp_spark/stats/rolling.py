"""csp.stats parity — rolling/expanding window statistics (SURVEY.md §2.5).

Reference: csp/stats.py (window setup 218-282, per-stat entry points
1461-3310) with O(1) incremental C++ accumulators
(cpp/csp/cppnodes/statsimpl.h). Spark-first realization: ONE augmented
frame (data ∪ trigger ∪ reset ∪ sampler rows) and per-key window
frames — every statistic is a JVM-side window aggregate; no Python in
the hot path. Spark recomputes each frame instead of delta-updating,
but it does so distributed + whole-stage-codegen'd, and (unlike the
reference) over any number of keys in parallel; the reference's
``recalc`` control (flush accumulated FP error, stats.py:218-282) is a
no-op here because every window is computed exactly.

Window semantics encoded (verified against the reference):
- interval: int = tick count, timedelta = time range (t - d, t], None =
  expanding (stats.py docstrings; WindowBuffer.h).
- min_window: tick-based gates on TOTAL sampler ticks — csp's
  ``_min_hit_by_tick`` uses ``csp.num_ticks`` which resets never
  (stats.py:134-141); time-based gates on engine start + min_window
  (``csp.const(True, delay=min_window)``, stats.py:143-146).
- trigger: emit rows (defaults to data ticks, stats.py:237-239).
- sampler: when given, data ticks at sampler ticks; x ticking without
  sampler is ignored; sampler without x yields NaN (stats.py rank
  docstring).
- reset: clears window contents (new epoch), ordered before same-cycle
  data.
- ignore_na=False: any NaN in window poisons the result
  (statsimpl.h:1859 NanCheck).
- min_data_points: fewer valid points → NaN (stats.py:2001).
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.align import align
from ..core.ticks import KEY, SEQ, TS, VALUE, TickStream

_NAN_V = float("nan")


def _nan() -> Column:
    return F.lit(_NAN_V)

# row-kind priorities at equal (ts, seq): reset clears first, data
# enters the (new) window, trigger reads after same-cycle data.
_PRI_RESET, _PRI_WEIGHT, _PRI_DATA, _PRI_TRIGGER = 0, 1, 2, 3

#: sub-timestamp causal window encoding (see causal_time_window):
#: S must exceed 2x the max number of engine cycles sharing one
#: (partition, microsecond); 4096 allows 2048 coincident cycles.
_TIE_S = 4096
_TIE_MAX = _TIE_S // 2 - 1  # 2047
_REL_MAX = (2 ** 63 - 1) // _TIE_S - _TIE_S  # ~71-year per-key span


def causal_time_window(
    partition_cols: list, order_cols: list, us: int,
    ts0: Column | None = None, tie_group: str = "__tsu",
) -> tuple[Column, tuple[int, int]]:
    """Exact per-cycle ``(t-d, t]`` time window over possibly-
    coincident engine cycles: returns ``(order_value, (lo, hi))`` for
    ``Window.orderBy(order_value_column).rangeBetween(lo, hi)``.

    A value-RANGE frame ordered by raw microseconds is peer-INCLUSIVE:
    every row at the current row's exact (partition, µs) — including
    FUTURE engine cycles at the same timestamp — lands in the frame,
    so an early cycle would see values the engine hasn't delivered yet
    (the reference computes each cycle from its buffer-so-far:
    WindowBuffer appends per cycle, csp/stats.py). Encoding the order
    value as ``rel_µs·S + tie`` (``tie`` = the cycle's 0-based rank
    within its (partition, µs) group, ``rel_µs`` = µs since the
    partition's first row) with constant bounds
    ``[-(us-1)·S - (S/2-1), 0]`` is EXACT for tie ranks < S/2:

    - upper 0: include iff (µs', tie') ≤ (µs, tie) lexicographically —
      causality;
    - lower: at the oldest included µs (µs-us+1) the slack S/2-1 ≥ tie
      admits every tie rank; at the excluded boundary µs-us admission
      would need tie' ≥ tie + S/2 + 1 > TIE_MAX — impossible.

    Ranks past S/2-1 or spans past ~71 years raise loudly instead of
    silently corrupting frames.

    ``ts0`` (optional) is a pre-computed per-partition min of ``__tsu``
    — pass it when the caller already materializes one so the plan
    computes the min ONCE instead of per call site (guide §2.4: the
    inline form adds a whole extra Window pass). ``tie_group`` names
    the column whose equal values define one coincident-µs group; a
    caller whose frame orders by a column physically 1:1 with
    ``__tsu`` (e.g. the raw timestamp) can pass that column so the tie
    window's required sort matches an existing sort and Catalyst drops
    the re-sort."""
    if us - 1 > _REL_MAX:
        # same ceiling as the runtime span check: past it the frame
        # bound (us-1)*S + S/2-1 itself overflows int64 at plan build
        raise ValueError(
            "time-window: interval exceeds the ~71-year causal-window "
            f"encoding range ({us} µs > {_REL_MAX + 1} µs)"
        )
    tie = F.row_number().over(
        Window.partitionBy(*partition_cols, tie_group).orderBy(*order_cols)
    ) - 1
    if ts0 is None:
        ts0 = F.min("__tsu").over(Window.partitionBy(*partition_cols))
    rel = F.col("__tsu") - ts0
    v = (
        F.when(tie > F.lit(_TIE_MAX), F.raise_error(F.lit(
            f"time-window: more than {_TIE_MAX + 1} engine cycles share "
            "one (key, microsecond); the sub-cycle causal window "
            f"encoding supports at most {_TIE_MAX + 1} coincident "
            "cycles — thin the burst or coarsen the clock"
        )))
        .when(rel > F.lit(_REL_MAX), F.raise_error(F.lit(
            "time-window: per-key time span exceeds the ~71-year "
            "causal-window encoding range"
        )))
        .otherwise(rel * F.lit(_TIE_S) + tie)
    )
    return v, (-((us - 1) * _TIE_S + _TIE_MAX), 0)


def _is_float(dtype: str) -> bool:
    return dtype in ("double", "float")


class Rolling:
    """Shared window engine — one instance, many statistics.

    All statistics of one Rolling share the same augmented frame and the
    same per-key sort, so Catalyst reuses a single exchange across e.g.
    ``r.mean()``, ``r.stddev()``, ``r.quantile(0.9)`` — ask for them
    together via :meth:`agg` to get them as columns of one frame.
    """

    def __init__(
        self,
        x: TickStream,
        interval: int | _dt.timedelta | None = None,
        min_window: int | _dt.timedelta | None = None,
        min_data_points: int = 0,
        ignore_na: bool = True,
        trigger: TickStream | None = None,
        sampler: TickStream | None = None,
        reset: TickStream | None = None,
        start_time: _dt.datetime | None = None,
        weights: TickStream | None = None,
    ):
        if isinstance(interval, _dt.timedelta) and interval <= _dt.timedelta(0):
            raise ValueError("time interval must be positive; expanding = None")
        if isinstance(interval, int) and interval < 1:
            raise ValueError("tick interval must be >= 1")
        if min_window is None:
            min_window = interval
        self.interval = interval
        self.min_window = min_window
        self.min_data_points = min_data_points
        self.ignore_na = ignore_na
        self.start_time = start_time
        self._x = x
        self._build(x, trigger, sampler, reset, weights)

    # ------------------------------------------------------------------
    def _build(self, x, trigger, sampler, reset, weights=None):
        dtype = dict(x.df.dtypes)[x.value_col]
        self._float = _is_float(dtype)
        vcast = "double" if dtype in ("int", "bigint", "long") else dtype

        if sampler is None:
            data = x.df.select(
                KEY, TS, SEQ,
                F.col(x.value_col).cast(vcast).alias(VALUE),
                F.lit(_PRI_DATA).alias("__pri"),
            )
        else:
            # sampler defines the data clock; x's value is taken only when
            # coincident with a sampler tick, else NaN (stats.py sampler doc)
            xs = x.df.select(
                KEY, TS, SEQ, F.col(x.value_col).cast(vcast).alias("__xv")
            )
            data = (
                sampler.df.select(KEY, TS, SEQ)
                .join(xs, on=[KEY, TS, SEQ], how="left")
                .select(
                    KEY, TS, SEQ,
                    F.coalesce(F.col("__xv"), _nan()).alias(VALUE),
                    F.lit(_PRI_DATA).alias("__pri"),
                )
            )
        data = data.withColumn("__wraw", F.lit(None).cast("double"))
        parts = [data]
        for s, pri in ((trigger, _PRI_TRIGGER), (reset, _PRI_RESET)):
            if s is not None:
                parts.append(
                    s.df.select(
                        KEY, TS, SEQ,
                        F.lit(None).cast(vcast).alias(VALUE),
                        F.lit(pri).alias("__pri"),
                        F.lit(None).cast("double").alias("__wraw"),
                    )
                )
        if weights is not None:
            # weights is a ts sampled at x's ticks with last-value
            # semantics (stats.py:218-282 `weights` control): weight rows
            # sort BEFORE data within a cycle (_PRI_WEIGHT < _PRI_DATA)
            # so a same-cycle weight applies to that data tick.
            parts.append(
                weights.df.select(
                    KEY, TS, SEQ,
                    F.lit(None).cast(vcast).alias(VALUE),
                    F.lit(_PRI_WEIGHT).alias("__pri"),
                    F.col(weights.value_col).cast("double").alias("__wraw"),
                )
            )
        df = reduce(lambda a, b: a.unionByName(b), parts)

        w_all = (
            Window.partitionBy(KEY)
            .orderBy(TS, SEQ, "__pri")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # full-frame twin of w_all: same (partition, order) spec, so
        # Catalyst folds its expressions into the SAME Window operator
        # as the cumulative ones (ExtractWindowExpressions groups by
        # partition+order, frames may differ) — a bare
        # Window.partitionBy(KEY) would cost its own pass instead
        w_full = (
            Window.partitionBy(KEY)
            .orderBy(TS, SEQ, "__pri")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        is_data = (F.col("__pri") == _PRI_DATA).cast("int")
        is_reset = (F.col("__pri") == _PRI_RESET).cast("int")
        nanish = F.isnan(VALUE) if self._float else F.lit(False)
        vv = F.when(F.col(VALUE).isNotNull() & ~nanish, F.col(VALUE))
        # control-stream-free fast paths (guide §2.4 — remove whole
        # window passes): with no reset stream __epoch is identically
        # 0 (sum of an always-0 indicator), with no weights stream
        # __wv is identically NULL — fold both to literals so the
        # cumulative Window pass carries fewer buffers and, where ALL
        # rows are data rows, the stat frame below can share w_all's
        # (partition, order) spec and fuse into ONE Window operator.
        # Values are unchanged (0 == sum(0), NULL == gated NULL), so
        # every statistic is bit-identical; the oracle gate re-proves.
        epoch = (F.lit(0).cast("bigint") if reset is None
                 else F.sum(is_reset).over(w_all))
        if weights is None:
            wv = F.lit(None).cast("double")
        else:
            wlast = F.last("__wraw", ignorenulls=True).over(w_all)
            # per-data-row weight: the as-of weight where the row carries a
            # usable value AND a positive weight exists (w<=0 skipped —
            # WeightedVariance::add, statsimpl.h:469-472)
            wv = F.when(
                vv.isNotNull() & (wlast > 0) & (F.col("__pri") == _PRI_DATA),
                wlast,
            )
        # every row is a data row iff no trigger/reset/weight rows were
        # unioned in (a sampler only re-clocks the data rows themselves)
        only_data = trigger is None and reset is None and weights is None
        needs_ts0 = isinstance(self.interval, _dt.timedelta) or (
            isinstance(self.min_window, _dt.timedelta)
            and self.min_window > _dt.timedelta(0)
            and self.start_time is None
        )
        didx = F.sum(is_data).over(w_all)
        cols = [
            KEY, TS, SEQ, "__pri", VALUE,
            epoch.alias("__epoch"),
            vv.alias("__vv"),
            (F.col(VALUE).isNotNull() & nanish).cast("int").alias("__isnan"),
            F.unix_micros(F.col(TS)).alias("__tsu"),
            wv.alias("__wv"),
        ]
        if not only_data:
            # the tick-window frame below orders by the materialized
            # running data index; with control rows present it cannot
            # share w_all's spec, so the column is real work here
            cols.append(didx.alias("__didx"))
            didx = F.col("__didx")
        # with only data rows __didx is referenced (if at all) by the
        # warm-up gate alone — keep it an unevaluated window expression
        # over w_all's own spec so it extracts into the SAME Window
        # operator as the statistics instead of forcing an earlier
        # materializing pass (one Window op total for tick/expanding)
        if needs_ts0:
            # per-key first timestamp, materialized ONCE in the fused
            # pass; the time-window rel encoding and the timedelta
            # warm-up gate both read it (the old shape computed an
            # inline min(__tsu) per use — one extra Window pass each)
            cols.append(
                F.min(F.unix_micros(F.col(TS))).over(w_full).alias("__ts0")
            )
        df = df.select(*cols)
        self._frame = df
        self._emit_pri = _PRI_TRIGGER if trigger is not None else _PRI_DATA
        pb = [KEY] if reset is None else [KEY, "__epoch"]

        # window frame over which statistics aggregate
        if self.interval is None:
            self._w = (
                Window.partitionBy(*pb)
                .orderBy(TS, SEQ, "__pri")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        elif isinstance(self.interval, int):
            if only_data:
                # every row is a data row, so the running data-tick
                # index equals the row position: the tick window is a
                # plain ROWS frame under w_all's own (partition,
                # order) spec — the stats fuse into the cumulative
                # Window operator instead of paying a second
                # Sort+Window over __didx (identical frames row-set:
                # __didx is strictly +1 per row here)
                self._w = (
                    Window.partitionBy(*pb)
                    .orderBy(TS, SEQ, "__pri")
                    .rowsBetween(-(self.interval - 1), 0)
                )
            else:
                # tick window: range over the running data-tick index;
                # trigger rows share the index of the preceding data
                # row and carry NULL values, so they never perturb
                # aggregates
                self._w = (
                    Window.partitionBy(*pb)
                    .orderBy("__didx")
                    .rangeBetween(-(self.interval - 1), 0)
                )
        else:
            us = (self.interval // _dt.timedelta(microseconds=1))
            # (t - d, t] — exclusive left edge at µs resolution, matching
            # the reference's WindowBuffer time windows / pandas
            # closed='right'; sub-timestamp CAUSAL (an early cycle at a
            # shared timestamp must not see later same-timestamp ticks)
            # tie_group=TS: timestamps are µs-precision, so grouping by
            # TS equals grouping by __tsu while letting the tie
            # window's sort (key, ts, seq, __pri) match w_all's
            tw, (lo, hi) = causal_time_window(
                [KEY], [SEQ, "__pri"], us,
                ts0=F.col("__ts0"), tie_group=TS,
            )
            self._frame = self._frame.withColumn("__tw", tw)
            self._w = (
                Window.partitionBy(*pb)
                .orderBy("__tw")
                .rangeBetween(lo, hi)
            )

        # warm-up gate
        mw = self.min_window
        if mw is None or (isinstance(mw, int) and mw <= 1):
            self._warm = F.lit(True)
        elif isinstance(mw, int):
            self._warm = didx >= mw
        elif mw <= _dt.timedelta(0) and self.start_time is None:
            # a non-positive warm-up from the stream's own first tick
            # admits every row — skip the gate (and its min window)
            self._warm = F.lit(True)
        else:
            mw_us = (mw // _dt.timedelta(microseconds=1))
            if self.start_time is not None:
                # interpret the naive start_time exactly as the TS
                # column is interpreted (session timezone), not as a
                # hard-coded UTC epoch — a non-UTC session would skew
                # the warm-up gate by the tz offset otherwise
                start_u = F.unix_micros(
                    F.lit(self.start_time).cast("timestamp")
                )
            else:
                start_u = F.col("__ts0")
            self._warm = F.col("__tsu") >= start_u + mw_us

    # ------------------------------------------------------------------
    # gating helpers
    # ------------------------------------------------------------------
    def _ok(self, needs: int | None = None) -> Column:
        # needs = the statistic's own minimum valid-point count (1 for
        # mean, ddof+1 for var, ... ; 0 for sum/count which are defined
        # on an empty window — Sum kernel statsimpl.h:56 returns 0)
        req = max(self.min_data_points, 1 if needs is None else needs)
        cond = F.count("__vv").over(self._w) >= req if req > 0 else F.lit(True)
        if not self.ignore_na:
            cond = cond & (F.sum("__isnan").over(self._w) == 0)
        return cond

    def _gated(self, agg: Column, needs: int | None = None) -> Column:
        return F.when(self._ok(needs), agg).otherwise(_nan())

    def _emit(self, expr: Column, name: str = VALUE) -> TickStream:
        # ONE select for stat + warm gate: chained withColumn puts a
        # Project between the window expressions, which blocks
        # CollapseWindow and leaves N stacked same-spec Window
        # operators (N buffer passes); a single projection extracts
        # them into one Window operator (guide §2.4)
        keep = [c for c in self._frame.columns if c != name]
        out = (
            self._frame.select(
                *keep, expr.alias(name), self._warm.alias("__warm")
            )
            .filter((F.col("__pri") == self._emit_pri) & F.col("__warm"))
            .select(KEY, TS, SEQ, name)
        )
        return TickStream(out, name)

    def agg(self, **stats: Column) -> DataFrame:
        """Compute several statistics in one pass: ``r.agg(m=r.mean_col(),
        s=r.stddev_col())`` → one frame, one shuffle, N columns."""
        # single select (not chained withColumn) so every stat's window
        # expressions land in ONE Window operator — see _emit
        keep = [c for c in self._frame.columns if c not in stats]
        out = self._frame.select(
            *keep,
            *[col.alias(name) for name, col in stats.items()],
            self._warm.alias("__warm"),
        )
        return out.filter(
            (F.col("__pri") == self._emit_pri) & F.col("__warm")
        ).select(KEY, TS, SEQ, *stats)

    # ------------------------------------------------------------------
    # statistics — each has a *_col (composable) and a TickStream form
    # (reference entry points cited; kernels statsimpl.h)
    # ------------------------------------------------------------------
    def count_col(self) -> Column:  # stats.py:1461; Count kernel :24
        return F.count("__vv").over(self._w).cast("double")

    def sum_col(self) -> Column:  # stats.py:1629; Sum :56 / KahanSum :94
        return self._gated(
            F.coalesce(F.sum("__vv").over(self._w), F.lit(0.0)), needs=0
        )

    def mean_col(self) -> Column:  # stats.py:1686; Mean :135
        return self._gated(F.avg("__vv").over(self._w), needs=1)

    def prod_col(self) -> Column:  # stats.py:1758; Product :288
        return self._gated(F.product("__vv").over(self._w), needs=1)

    def gmean_col(self) -> Column:  # stats.py:2119
        return self._gated(F.exp(F.avg(F.log("__vv")).over(self._w)), needs=1)

    def min_col(self) -> Column:  # stats.py:1906; AscendingMinima :1245
        return self._gated(F.min("__vv").over(self._w), needs=1)

    def max_col(self) -> Column:
        return self._gated(F.max("__vv").over(self._w), needs=1)

    def first_col(self) -> Column:  # stats.py:1546; First :175
        return self._gated(F.first("__vv", ignorenulls=True).over(self._w), needs=1)

    def last_col(self) -> Column:  # stats.py:1587; Last :206
        return self._gated(F.last("__vv", ignorenulls=True).over(self._w), needs=1)

    def unique_col(self, precision: int = 10) -> Column:  # stats.py:1504; Unique :242
        arr = F.collect_list(F.round("__vv", precision)).over(self._w)
        return self._gated(F.size(F.array_distinct(arr)).cast("double"), needs=1)

    def var_col(self, ddof: int = 1) -> Column:  # stats.py:2396; Welford :383
        n = F.count("__vv").over(self._w)
        vpop = F.var_pop("__vv").over(self._w)
        return self._gated(vpop * n / (n - ddof), needs=ddof + 1)

    def stddev_col(self, ddof: int = 1) -> Column:
        return self._gated(
            F.sqrt(F.var_pop("__vv").over(self._w)
                   * F.count("__vv").over(self._w)
                   / (F.count("__vv").over(self._w) - ddof)),
            needs=ddof + 1,
        )

    def sem_col(self, ddof: int = 1) -> Column:  # stats.py StandardError :744
        n = F.count("__vv").over(self._w)
        return self._gated(
            F.sqrt(F.var_pop("__vv").over(self._w) * n / (n - ddof)) / F.sqrt(n),
            needs=ddof + 1,
        )

    # -- weighted family (stats.py `weights` arg; WeightedMean :340,
    #    WeightedVariance :455, WeightedStandardError :~790). Elements
    #    contribute only where both the value is usable and the as-of
    #    weight is > 0 (__wv column, built in _build).
    def _wgated(self, agg: Column, needs_w: Column | int) -> Column:
        W = F.sum("__wv").over(self._w)
        cond = W > (F.lit(needs_w) if isinstance(needs_w, int) else needs_w)
        if self.min_data_points > 0:
            cond = cond & (F.count("__wv").over(self._w) >= self.min_data_points)
        if not self.ignore_na:
            cond = cond & (F.sum("__isnan").over(self._w) == 0)
        return F.when(cond, agg).otherwise(_nan())

    def wsum_col(self) -> Column:
        return self._gated(
            F.coalesce(F.sum(F.col("__vv") * F.col("__wv")).over(self._w), F.lit(0.0)),
            needs=0,
        )

    def wmean_col(self) -> Column:
        return self._wgated(
            F.sum(F.col("__vv") * F.col("__wv")).over(self._w)
            / F.sum("__wv").over(self._w),
            needs_w=0,
        )

    def wvar_col(self, ddof: int = 1) -> Column:
        # (S2 - S1^2/W) / (W - ddof); homogeneous window -> 0
        # (WeightedVariance::compute, statsimpl.h:508-519)
        W = F.sum("__wv").over(self._w)
        s1 = F.sum(F.col("__vv") * F.col("__wv")).over(self._w)
        s2 = F.sum(F.col("__vv") * F.col("__vv") * F.col("__wv")).over(self._w)
        raw = (s2 - s1 * s1 / W) / (W - ddof)
        homog = F.min(F.when(F.col("__wv").isNotNull(), F.col("__vv"))).over(
            self._w
        ) == F.max(F.when(F.col("__wv").isNotNull(), F.col("__vv"))).over(self._w)
        val = F.when(homog, F.lit(0.0)).otherwise(F.greatest(raw, F.lit(0.0)))
        return self._wgated(val, needs_w=ddof)

    def wstddev_col(self, ddof: int = 1) -> Column:
        return F.sqrt(self.wvar_col(ddof))

    def wsem_col(self, ddof: int = 1) -> Column:
        # sqrt(wvar / W) (WeightedStandardError::compute). The W>0 guard
        # keeps the division un-evaluated when the weight sum is zero —
        # ANSI sessions raise DIVIDE_BY_ZERO on NaN/0 (NaN is non-null).
        W = F.sum("__wv").over(self._w)
        return F.sqrt(F.when(W > 0, self.wvar_col(ddof) / W).otherwise(_nan()))

    def skew_col(self, bias: bool = False) -> Column:  # stats.py:2748; Skew :873
        n = F.count("__vv").over(self._w)
        g1 = F.skewness("__vv").over(self._w)
        adj = F.when(
            F.lit(bias), g1
        ).otherwise(g1 * F.sqrt(n * (n - 1)) / (n - 2))
        return self._gated(adj, needs=3)

    def kurt_col(self, excess: bool = True, bias: bool = False) -> Column:
        # stats.py:2824; Kurtosis :979. Spark kurtosis() = excess population g2.
        n = F.count("__vv").over(self._w)
        g2 = F.kurtosis("__vv").over(self._w)
        unb = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        out = F.when(F.lit(bias), g2).otherwise(unb)
        if not excess:
            out = out + 3
        return self._gated(out, needs=4)

    def quantile_col(self, q: float, interpolation: str = "linear") -> Column:
        # stats.py:1800; order-statistic kernel Quantile :1127
        if interpolation == "linear":
            # F.percentile over the window, kept deliberately: an r12
            # A/B (same session, interleaved, 4 rounds) measured the
            # "one collect_list + array_sort + exact-interpolation"
            # rewrite at 3.5x SLOWER — the per-row array allocation +
            # sort loses to Percentile's incremental map even on
            # 20-row frames. Not an optimization target.
            return self._gated(F.percentile("__vv", F.lit(q)).over(self._w), needs=1)
        arr = F.array_sort(
            F.filter(F.collect_list("__vv").over(self._w), lambda v: ~F.isnan(v))
        )
        n = F.size(arr)
        h = (n - 1) * F.lit(float(q))
        lo = F.floor(h).cast("int")
        hi = F.ceil(h).cast("int")
        if interpolation == "lower":
            pick = F.element_at(arr, lo + 1)
        elif interpolation == "higher":
            pick = F.element_at(arr, hi + 1)
        elif interpolation == "midpoint":
            pick = (F.element_at(arr, lo + 1) + F.element_at(arr, hi + 1)) / 2
        elif interpolation == "nearest":
            # round-half-even, matching the reference's std::nearbyint
            nearest = F.when(
                (h - lo == 0.5) & (lo % 2 == 0), lo
            ).otherwise(F.round(h).cast("int"))
            pick = F.element_at(arr, nearest + 1)
        else:
            raise ValueError(f"unknown interpolation {interpolation!r}")
        return self._gated(pick, needs=1)

    def median_col(self) -> Column:  # stats.py:2175
        return self.quantile_col(0.5)

    def argmax_col(self) -> Column:  # stats.py:2053; ArgMinMax :1402
        # timestamp of the max value; earliest occurrence wins on ties
        best = F.max(
            F.when(F.col("__vv").isNotNull(),
                   F.struct(F.col("__vv").alias("v"), (-F.col("__tsu")).alias("nt")))
        ).over(self._w)
        return F.when(self._ok(1), F.timestamp_micros(-best["nt"]))

    def argmin_col(self) -> Column:
        best = F.min(
            F.when(F.col("__vv").isNotNull(),
                   F.struct(F.col("__vv").alias("v"), F.col("__tsu").alias("t")))
        ).over(self._w)
        return F.when(self._ok(1), F.timestamp_micros(best["t"]))

    def rank_col(self, method: str = "min", na_option: str = "keep") -> Column:
        # stats.py:1992-2050: 0-indexed rank of the last tick among window
        # values (window includes that tick): min = count(< v),
        # max = count(<= v) - 1, avg = mean of the two.
        last_raw = F.last(VALUE, ignorenulls=True).over(self._w)
        v = F.last("__vv", ignorenulls=True).over(self._w)
        arr = F.filter(F.collect_list("__vv").over(self._w), lambda e: ~F.isnan(e))
        lt_ = F.size(F.filter(arr, lambda e: e < v)).cast("double")
        le_ = F.size(F.filter(arr, lambda e: e <= v)).cast("double") - 1
        if method == "min":
            r = lt_
        elif method == "max":
            r = le_
        elif method == "avg":
            r = (lt_ + le_) / 2
        else:
            raise ValueError("rank method must be min/max/avg")
        if na_option == "keep":
            r = F.when(F.isnan(last_raw), _nan()).otherwise(r)
        elif na_option != "last":
            raise ValueError("na_option must be keep/last")
        return self._gated(r, needs=1)

    def cross_sectional_col(self) -> Column:  # stats.py:3265
        return F.collect_list("__vv").over(self._w)

    # TickStream wrappers ------------------------------------------------
    def count(self):  return self._emit(self.count_col())
    def sum(self):    return self._emit(self.sum_col())
    def mean(self):   return self._emit(self.mean_col())
    def prod(self):   return self._emit(self.prod_col())
    def gmean(self):  return self._emit(self.gmean_col())
    def min(self):    return self._emit(self.min_col())
    def max(self):    return self._emit(self.max_col())
    def first(self):  return self._emit(self.first_col())
    def last(self):   return self._emit(self.last_col())
    def unique(self, precision: int = 10):
        return self._emit(self.unique_col(precision))
    def wsum(self):   return self._emit(self.wsum_col())
    def wmean(self):  return self._emit(self.wmean_col())
    def wvar(self, ddof: int = 1):    return self._emit(self.wvar_col(ddof))
    def wstddev(self, ddof: int = 1): return self._emit(self.wstddev_col(ddof))
    def wsem(self, ddof: int = 1):    return self._emit(self.wsem_col(ddof))
    def var(self, ddof: int = 1):   return self._emit(self.var_col(ddof))
    def stddev(self, ddof: int = 1): return self._emit(self.stddev_col(ddof))
    def sem(self, ddof: int = 1):   return self._emit(self.sem_col(ddof))
    def skew(self, bias: bool = False): return self._emit(self.skew_col(bias))
    def kurt(self, excess: bool = True, bias: bool = False):
        return self._emit(self.kurt_col(excess, bias))
    def quantile(self, q: float, interpolation: str = "linear"):
        return self._emit(self.quantile_col(q, interpolation))
    def median(self): return self._emit(self.median_col())
    def argmax(self): return self._emit(self.argmax_col())
    def argmin(self): return self._emit(self.argmin_col())
    def rank(self, method: str = "min", na_option: str = "keep"):
        return self._emit(self.rank_col(method, na_option))
    def cross_sectional(self): return self._emit(self.cross_sectional_col())


class RollingPair:
    """Bivariate rolling statistics — cov/corr (stats.py:2222-2334,
    2586-2691; Covariance :535, Correlation :660).

    x and y are aligned as-of first (valid-pair semantics: a window
    element exists where x ticks and both last-values are non-NaN —
    matching the reference's synchronized bivariate path,
    stats.py:283-300)."""

    def __init__(
        self,
        x: TickStream,
        y: TickStream,
        interval: int | _dt.timedelta | None = None,
        min_window: int | _dt.timedelta | None = None,
        min_data_points: int = 0,
    ):
        a = align({"__x": x, "__y": y}, keep_ticked=True)
        pair_ok = (
            F.col("__x").isNotNull() & F.col("__y").isNotNull()
            & ~F.isnan("__x") & ~F.isnan("__y")
        )
        df = a.filter(F.col("__x__ticked") | F.col("__y__ticked")).select(
            KEY, TS, SEQ,
            F.when(pair_ok, F.col("__x")).alias("__vx"),
            F.when(pair_ok, F.col("__y")).alias("__vy"),
            F.unix_micros(F.col(TS)).alias("__tsu"),
        )
        w = Window.partitionBy(KEY).orderBy(TS, SEQ)
        df = df.withColumn(
            "__didx", F.sum(F.col("__vx").isNotNull().cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        )
        if interval is None:
            self._w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        elif isinstance(interval, int):
            self._w = Window.partitionBy(KEY).orderBy("__didx").rangeBetween(
                -(interval - 1), 0
            )
        else:
            us = (interval // _dt.timedelta(microseconds=1))
            tw, (lo, hi) = causal_time_window([KEY], [SEQ], us)
            df = df.withColumn("__tw", tw)
            self._w = (
                Window.partitionBy(KEY).orderBy("__tw").rangeBetween(lo, hi)
            )
        if min_window is None:
            min_window = interval
        if isinstance(min_window, int) and min_window > 1:
            self._warm = F.col("__didx") >= min_window
        elif isinstance(min_window, _dt.timedelta):
            start_u = F.min("__tsu").over(Window.partitionBy(KEY))
            self._warm = F.col("__tsu") >= start_u + (min_window // _dt.timedelta(microseconds=1))
        else:
            self._warm = F.lit(True)
        self._frame = df
        self.min_data_points = min_data_points

    def _emit(self, agg: Column, needs: int) -> TickStream:
        n = F.count("__vx").over(self._w)
        mdp = max(self.min_data_points, needs)
        expr = F.when(n >= mdp, agg).otherwise(_nan())
        out = (
            self._frame.withColumn(VALUE, expr)
            .withColumn("__warm", self._warm)
            .filter(F.col("__warm"))
            .select(KEY, TS, SEQ, VALUE)
        )
        return TickStream(out)

    def cov(self, ddof: int = 1) -> TickStream:
        n = F.count("__vx").over(self._w)
        cpop = F.covar_pop("__vx", "__vy").over(self._w)
        return self._emit(cpop * n / (n - ddof), needs=ddof + 1)

    def corr(self) -> TickStream:
        return self._emit(F.corr("__vx", "__vy").over(self._w), needs=2)
