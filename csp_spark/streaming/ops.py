"""Streaming operators: PushModes, windowed stats, stateful EMA.

Reference semantics being mapped (SURVEY.md §2.8):

- PushMode.LAST_VALUE / BURST / NON_COLLAPSING
  (csp/impl/types/common_definitions.py:274-289): how a realtime
  adapter's backlog collapses into engine cycles. Spark microbatches
  play the role of the backlog drain: LAST_VALUE keeps only the newest
  row per (key, bucket), BURST emits the queued list, NON_COLLAPSING is
  the raw stream with (ts, seq) order preserved.
- csp has NO watermarks (adapters deliver in order); Structured
  Streaming needs them for state cleanup, so every windowed op takes an
  explicit ``watermark`` (documented semantic delta).
- csp.stats in realtime = same rolling semantics driven by wall clock;
  here: watermarked sliding windows (groupBy window()) for time-bucket
  stats, and applyInPandasWithState for per-tick recursive state (EMA —
  statsimpl.h:1473).
"""

from __future__ import annotations

import copy as _copy
import datetime as _dt
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..core.ticks import KEY, SEQ, TS, VALUE


def _iv(td: _dt.timedelta) -> str:
    # exact integer microseconds: float seconds render sub-100µs
    # intervals in scientific notation, which Spark's interval parser
    # accepts but resolves to a DEGENERATE window/session gap that
    # silently drops every row (probed on session_window)
    return f"{td // _dt.timedelta(microseconds=1)} microseconds"


def with_watermark(x: DataFrame, delay: _dt.timedelta) -> DataFrame:
    return x.withWatermark(TS, _iv(delay))


def conflate_last_value(
    x: DataFrame, bucket: _dt.timedelta, watermark: _dt.timedelta | None = None
) -> DataFrame:
    """PushMode.LAST_VALUE: within each (key, bucket) keep the newest
    value by (ts, seq). Emits (key, ts=bucket end, seq=0, value)."""
    src = with_watermark(x, watermark or bucket)
    out = (
        src.groupBy(F.window(TS, _iv(bucket)).alias("__w"), KEY)
        .agg(F.max_by(VALUE, F.struct(TS, SEQ)).alias(VALUE))
        .select(
            KEY,
            F.col("__w.end").alias(TS),
            F.lit(0).cast("long").alias(SEQ),
            VALUE,
        )
    )
    return out


def dedup_stream(
    x: DataFrame,
    cols: list[str],
    watermark: _dt.timedelta,
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication: keep the FIRST row per `cols`
    value — the streaming counterpart of dedup.dedup_exact for a live
    document/event feed (dedup on a fingerprint column, e.g.
    ``F.xxhash64(normalize(text))``, computed upstream).

    State design for an unbounded corpus: with within_watermark=True
    (default) Spark keeps a seen-set entry only until the watermark
    passes it (``dropDuplicatesWithinWatermark``) — state is bounded
    by the watermark horizon, so the stream runs forever; duplicates
    separated by more than the horizon are NOT collapsed (document the
    horizon as the dedup guarantee). within_watermark=False uses
    ``dropDuplicates`` — exact across the whole stream but state grows
    with distinct keys; only for bounded runs."""
    src = with_watermark(x, watermark)
    if within_watermark:
        return src.dropDuplicatesWithinWatermark(cols)
    return src.dropDuplicates(cols)


def burst_stream(
    x: DataFrame, bucket: _dt.timedelta, watermark: _dt.timedelta | None = None
) -> DataFrame:
    """PushMode.BURST: each (key, bucket) emits the list of queued
    values in engine order (csp burst delivers List[T] in one tick)."""
    src = with_watermark(x, watermark or bucket)
    return (
        src.groupBy(F.window(TS, _iv(bucket)).alias("__w"), KEY)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(TS, SEQ, F.col(VALUE).alias("v")))
            ).alias("__q")
        )
        .select(
            KEY,
            F.col("__w.end").alias(TS),
            F.lit(0).cast("long").alias(SEQ),
            F.transform("__q", lambda s: s["v"]).alias(VALUE),
        )
    )


def rolling_time_stats_stream(
    x: DataFrame,
    window: _dt.timedelta,
    slide: _dt.timedelta,
    watermark: _dt.timedelta | None = None,
) -> DataFrame:
    """Sliding-window count/sum/mean/min/max over the stream — the
    realtime face of csp.stats with a time interval (stats.py:218-282).
    csp recomputes at every tick; Structured Streaming emits per slide
    (documented delta — per-tick emission in streaming requires the
    stateful path)."""
    src = with_watermark(x, watermark or window)
    return (
        src.groupBy(F.window(TS, _iv(window), _iv(slide)).alias("__w"), KEY)
        .agg(
            F.count(VALUE).alias("roll_count"),
            F.sum(VALUE).alias("roll_sum"),
            F.avg(VALUE).alias("roll_mean"),
            F.min(VALUE).alias("roll_min"),
            F.max(VALUE).alias("roll_max"),
        )
        .select(
            KEY,
            F.col("__w.end").alias(TS),
            F.lit(0).cast("long").alias(SEQ),
            "roll_count", "roll_sum", "roll_mean", "roll_min", "roll_max",
        )
    )


def rolling_tick_stats_stream(
    x: DataFrame, window: int, quantiles: "dict[str, float] | None" = None
) -> DataFrame:
    """PER-TICK trailing-``window``-tick stats over the stream — exact
    csp.stats realtime semantics (recompute at every tick), unlike
    ``rolling_time_stats_stream`` which emits per slide (the documented
    watermark-window delta). The per-key state is the window's value
    ring (≤ ``window`` doubles per key in the state store, bounded by
    construction); each tick appends, evicts, and emits
    count/sum/mean/min/max of the current ring.

    Same in-order contract as ema_stream: rows arrive time-ordered per
    key across microbatches; within a batch the fold sorts by
    (ts, seq). Equality-tested against the batch stats.Rolling tick
    window.

    ``quantiles``: extra per-tick exact quantile columns, e.g.
    ``{"roll_p50": 0.5}`` — csp.stats.quantile's realtime form. The
    interpolation replicates Spark SQL percentile()'s linear rule
    (``lower·(hi−pos) + higher·(pos−lo)``) bit-for-bit so the column
    equals the batch Rolling.quantile path."""
    if window < 1:
        raise ValueError("window must be >= 1 tick")
    qcols = dict(quantiles or {})

    out_schema = (
        f"{KEY} string, {TS} timestamp, {SEQ} long, roll_count long, "
        "roll_sum double, roll_mean double, roll_min double, "
        "roll_max double"
        + "".join(f", {name} double" for name in qcols)
    )

    def _pct(sorted_vals: list, q: float):
        n = len(sorted_vals)
        if not n:
            return None
        pos = (n - 1) * q
        lo = int(pos // 1)
        hi = -(-pos // 1)
        if hi == lo:
            return sorted_vals[lo]
        return sorted_vals[lo] * (hi - pos) + sorted_vals[int(hi)] * (pos - lo)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ring: list = list(state.get[0]) if state.exists else []
        out = []
        parts = list(pdfs)
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values([TS, SEQ])
            for ts, seq, v in zip(pdf[TS], pdf[SEQ], pdf[VALUE]):
                fv = float(v)
                ring.append(fv)
                if len(ring) > window:
                    ring.pop(0)
                vals = [r for r in ring if r == r]  # NaN-skipping stats
                n = len(vals)
                s = sum(vals) if n else None
                row = [
                    key[0], ts, seq, n, s,
                    (s / n) if n else None,
                    min(vals) if n else None,
                    max(vals) if n else None,
                ]
                if qcols:
                    sv = sorted(vals)
                    row += [_pct(sv, q) for q in qcols.values()]
                out.append(tuple(row))
        state.update((ring,))
        yield pd.DataFrame(
            out,
            columns=[KEY, TS, SEQ, "roll_count", "roll_sum", "roll_mean",
                     "roll_min", "roll_max", *qcols],
        )

    return x.groupBy(KEY).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="ring array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------------
# stateful per-tick EMA — applyInPandasWithState
# ----------------------------------------------------------------------

def align_stream(streams: "dict[str, DataFrame]") -> DataFrame:
    """The align kernel in REALTIME mode: union the named tick streams
    and maintain per-key last-value state in the state store, emitting
    one wide row per tick with every stream's latest value (NULL until
    a stream's first tick = csp 'not yet valid') plus per-stream
    ``<name>__ticked`` flags — the same frame batch ``core.align``
    produces, so downstream valid-gated column ops (binary math,
    sample, struct_fromts) are IDENTICAL code in both modes.

    Ordering contract (same as ema_stream and the reference's realtime
    engine): rows arrive time-ordered per key across microbatches;
    within a batch rows fold in (ts, seq, source-tag) order. Same
    (ts, seq) across streams = one engine cycle → one output row with
    both ticked flags true (batch align's cycle-collapse rule).
    """
    names = list(streams)
    parts = []
    for i, (name, s) in enumerate(streams.items()):
        parts.append(
            s.select(
                F.col(KEY), F.col(TS), F.col(SEQ),
                F.lit(i).alias("__src"),
                F.col(VALUE).cast("double").alias(VALUE),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    out_schema = (
        f"{KEY} string, {TS} timestamp, {SEQ} long, "
        + ", ".join(f"{n} double, {n}__ticked boolean" for n in names)
    )
    state_schema = ", ".join(f"s{i} double" for i in range(len(names)))
    n_src = len(names)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = list(state.get) if state.exists else [None] * n_src
        rows: dict[tuple, list] = {}
        # Concatenate ALL of the group's Arrow chunks before sorting:
        # applyInPandasWithState splits a group's microbatch into
        # multiple chunks (arrow.maxRecordsPerBatch) with no cross-chunk
        # ordering guarantee — sorting per chunk would fold rows out of
        # (ts, seq) order and corrupt last-value state.
        parts = list(pdfs)
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values(
                [TS, SEQ, "__src"]
            )
            for ts, seq, src, v in zip(
                pdf[TS], pdf[SEQ], pdf["__src"], pdf[VALUE]
            ):
                last[int(src)] = float(v)
                cycle = (ts, seq)
                row = rows.get(cycle)
                if row is None:
                    row = [key[0], ts, seq] + [None, False] * n_src
                    rows[cycle] = row
                # refresh EVERY stream's last value on this cycle row
                for j in range(n_src):
                    row[3 + 2 * j] = last[j]
                row[3 + 2 * int(src) + 1] = True
        state.update(tuple(last))
        cols = [KEY, TS, SEQ] + [
            c for n in names for c in (n, f"{n}__ticked")
        ]
        yield pd.DataFrame(list(rows.values()), columns=cols)

    return u.groupBy(KEY).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EMA_OUT_SCHEMA = (
    f"{KEY} string, {TS} timestamp, {SEQ} long, value double"
)
_EMA_STATE_SCHEMA = "ema double, n long"


def ema_stream(x: DataFrame, alpha: float) -> DataFrame:
    """Per-tick recursive EMA over the stream, exact parity with
    csp.stats.ema(adjust=False) (stats.py:2910-3006; EMA kernel
    statsimpl.h:1473): state (ema, n) lives in the state store per key
    and survives across microbatches; each batch folds its rows in
    (ts, seq) order.

    Ordering contract: rows must arrive time-ordered per key ACROSS
    microbatches (Kafka partition ordering / chronological file drops)
    — the same in-order delivery the reference assumes of its adapters
    (SURVEY.md §2.8 'csp assumes adapters deliver in order')."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ema, n = state.get
        else:
            ema, n = 0.0, 0
        out = []
        # Same cross-chunk rule as align_stream's fold: concat every
        # chunk first, sort once — per-chunk sorting breaks (ts, seq)
        # order when a group's batch spans Arrow chunks.
        parts = list(pdfs)
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values([TS, SEQ])
            for ts, seq, v in zip(pdf[TS], pdf[SEQ], pdf[VALUE]):
                fv = float(v)
                if fv != fv:  # NaN: ignore_na=True semantics
                    out.append((key[0], ts, seq, ema if n else float("nan")))
                    continue
                ema = fv if n == 0 else (1.0 - alpha) * ema + alpha * fv
                n += 1
                out.append((key[0], ts, seq, ema))
        state.update((ema, n))
        yield pd.DataFrame(out, columns=[KEY, TS, SEQ, VALUE])

    return x.groupBy(KEY).applyInPandasWithState(
        fold,
        outputStructType=_EMA_OUT_SCHEMA,
        stateStructType=_EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ohlc_bars_stream(
    x: DataFrame,
    interval: _dt.timedelta,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Tumbling OHLC bars over a stream — the realtime twin of
    stats/resample.ohlc_bars: per-key epoch-aligned ``interval``
    buckets with open/close in (ts, seq) order, built on the native
    watermarked window aggregate (state = one running bar per open
    window per key, dropped when the watermark passes the bar end).

    Append mode emits each bar exactly once when it finalizes;
    ``complete`` mode (no finalization wait) suits bounded test runs.
    Equality-tested against the batch form over the same rows."""
    if interval <= _dt.timedelta(0):
        raise ValueError("interval must be positive")
    order = F.struct(F.col(TS), F.col(SEQ))
    v = F.col(VALUE)
    return (
        x.withWatermark(TS, watermark)
        .groupBy(F.col(KEY), F.window(F.col(TS), _iv(interval)))
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(v).alias("n_ticks"),
            F.avg(v).alias("mean"),
        )
        .select(
            KEY,
            F.col("window.start").alias("bar_start"),
            "open", "high", "low", "close", "n_ticks", "mean",
        )
    )


def session_bars_stream(
    x: DataFrame,
    gap: _dt.timedelta,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gap-based session aggregates over a stream — the realtime twin
    of stats/resample.session_bars, built on Spark's NATIVE
    ``session_window`` aggregate: per key, a session extends while
    ticks arrive within ``gap`` of each other and finalizes when the
    watermark passes ``last tick + gap``. State = one open session
    per key, dropped at finalization — the exact stateful-node
    semantics the reference writes by hand, with the state store
    managed by the engine.

    Column parity with the batch form except the 0-based
    ``session_idx`` (a streaming aggregate has no per-key running
    index; sessions are identified by their start time instead).
    Equality-tested against session_bars over the same rows."""
    if gap <= _dt.timedelta(0):
        raise ValueError("gap must be positive")
    v = F.col(VALUE)
    order = F.struct(F.col(TS), F.col(SEQ))
    return (
        x.withWatermark(TS, watermark)
        .groupBy(F.col(KEY), F.session_window(F.col(TS), _iv(gap)))
        .agg(
            F.min(F.col(TS)).alias("session_start"),
            F.max(F.col(TS)).alias("session_end"),
            (F.unix_micros(F.max(F.col(TS)))
             - F.unix_micros(F.min(F.col(TS)))).alias("duration_us"),
            F.count(v).alias("n_ticks"),
            F.min_by(v, order).alias("first_v"),
            F.max_by(v, order).alias("last_v"),
            F.sum(v).alias("sum_v"),
        )
        .drop("session_window")
    )


def incremental_dedup_stream(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_fn=None,
):
    """Streaming rolling-corpus build: each microbatch of incoming
    documents is cleaned against the ACCUMULATED corpus with
    dedup.components.incremental_dedup (near-dup pairs over corpus ∪
    batch; existing docs immutable, anchored components drop their
    incoming members, all-incoming components keep the min id) and the
    survivors are appended to the corpus — the live form of
    ingestion-time dedup. Processing batches b1..bn lands exactly the
    corpus the batch loop ``for b: corpus += incremental_dedup(corpus,
    b)`` builds (equality-tested).

    Idempotence: each microbatch writes its survivors to a
    ``batch=<epoch_id>`` partition directory with overwrite semantics,
    so a retried batch rewrites the same partition instead of
    double-appending (the standard foreachBatch exactly-once recipe).
    Readers see the corpus as one partitioned parquet table.

    Cost per batch = one bucketed pair pipeline over corpus ∪ batch —
    see incremental_dedup's scale note; persist the corpus side's
    MinHash signatures (pipeline/storage bucketed tables) to amortize
    repeated ingests at 100 TB.

    Returns the started StreamingQuery (caller stops it).
    """
    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_dedup_batch(
            batch_df, epoch_id, corpus_path,
            id_col=id_col, text_col=text_col, pair_fn=pair_fn,
        )

    return (
        docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def ingest_dedup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    pair_fn=None,
) -> None:
    """One microbatch of the rolling-corpus build (the foreachBatch
    body of incremental_dedup_stream, exposed so retry behavior is
    directly testable): dedup ``batch_df`` against the corpus
    accumulated by EARLIER epochs and (over)write this epoch's
    survivors partition."""
    from ..dedup.components import incremental_dedup

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    incoming = batch_df.select(id_col, text_col)
    try:
        # exclude the CURRENT epoch's partition: on a retry (epoch
        # ran, crashed before the checkpoint commit) its half-done
        # batch=N files must neither count as corpus nor sit in
        # the scan's file index while the overwrite below deletes
        # them. Partition pruning keeps them unread.
        existing = (
            spark.read.parquet(corpus_path)
            .filter(F.col("batch") < F.lit(int(epoch_id)))
            .select(id_col, text_col)
        )
        existing.schema  # force analysis so a missing path raises HERE
    except Exception as ex:
        # only "no corpus yet" may fall through to the empty frame;
        # a corrupt file / IO / permission error must abort the
        # batch, not silently dedup against nothing
        msg = str(ex)
        if not ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg):
            raise
        existing = spark.createDataFrame([], incoming.schema)
    kept = incremental_dedup(
        existing, incoming,
        pair_fn=pair_fn, id_col=id_col, text_col=text_col,
    )
    kept.write.mode("overwrite").parquet(
        f"{corpus_path}/batch={int(epoch_id)}"
    )


def run_node_stream(
    fn,
    streams: "DataFrame | dict[str, DataFrame]",
    state: "dict | Callable[[], dict] | None" = None,
    output_type: str = "double",
    initial_states: "dict | DataFrame | None" = None,
    alarms: bool = False,
    watermark: "_dt.timedelta" = _dt.timedelta(0),
) -> DataFrame:
    """:func:`csp_spark.run_node` in REALTIME mode — imperative
    per-cycle nodes over live microbatches, per-key state in the state
    store (reference: the same @csp.node body runs unchanged in
    csp.run(realtime=True)).

    One stateful stage does both jobs: the tagged union folds to
    engine cycles with last-value carry (align_stream's kernel), and
    the user's ``fn(cycle)`` runs once per cycle with its state dict
    pickled into the store between microbatches (arbitrary Python
    state, same bytes the batch runner keeps in-process).

    **Alarms** (``alarms=True``): ``cycle.schedule_alarm`` /
    ``cancel_alarm`` work in a live streaming query with the
    reference's engine semantics (cpp AlarmInputAdapter): an alarm
    fires as its OWN engine cycle at its scheduled time — interleaved
    in (ts, seq) order with input cycles when input is flowing, and
    woken by an event-time state timeout when the key is idle (the
    watermark advancing past the alarm time is the streaming analog of
    the engine clock reaching it). The pending-alarm heap is pickled
    WITH the user state dict in one blob, so a handle a node stored in
    ``cycle.state`` still cancels the heap's entry after a state-store
    round trip (pickle preserves object identity within one blob).
    Spark 4's ``transformWithStateInPandas`` timers are the
    one-timer-per-alarm native API, but its Python worker needs the
    ``google.protobuf`` package (absent in this environment), so the
    timer is emulated on ``applyInPandasWithState`` with ONE re-armed
    event-time timeout = the earliest pending alarm — semantically
    identical (timers only WAKE the key; firing order is owned by the
    heap either way). With ``alarms=False`` (default)
    ``schedule_alarm`` raises, keeping the no-alarm fast path's state
    row free of the heap blob.

    Ordering contract: rows arrive time-ordered per key across
    microbatches; within a batch cycles fold in (ts, seq) order with
    coincident multi-stream ticks collapsed to ONE cycle (batch
    align's rule); an alarm coincident with an input tick fires after
    that timestamp's input cycles (batch _keyed_runner's rule).
    Equality-tested against batch run_node, alarms included.
    """
    import pickle

    from ..core.noderun import NO_OUTPUT, NodeCycle

    named = {"x": streams} if isinstance(streams, DataFrame) else dict(streams)
    names = list(named)
    n_src = len(names)
    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    parts = []
    for i, (name, s) in enumerate(named.items()):
        # the state-store row holds doubles — reject non-numeric inputs
        # LOUDLY (batch run_node passes values through untyped; a cast
        # here would silently NULL strings/decimals and the node would
        # read NaN forever)
        vt = dict(s.dtypes).get(VALUE, "")
        if vt.split("(")[0] not in _NUMERIC:
            raise TypeError(
                f"run_node_stream input '{name}' has value type {vt!r}; "
                "the streaming runner carries double values — cast "
                "numerics explicitly, or run non-numeric nodes in batch "
                "mode (run_node)"
            )
        parts.append(
            s.select(
                F.col(KEY), F.col(TS), F.col(SEQ),
                F.lit(i).alias("__src"),
                F.col(VALUE).cast("double").alias(VALUE),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    out_schema = f"{KEY} string, {TS} timestamp, {SEQ} long, {VALUE} {output_type}"
    state_schema = (
        ", ".join(f"s{i} double" for i in range(n_src)) + ", ustate binary"
    )
    # batch run_node parity: state may be a zero-arg factory (fresh
    # per key) or a dict prototype (deep-copied per key) — the ONE
    # implementation of that rule lives in core.noderun
    from ..core.noderun import _state_factory

    mk_state = _state_factory(state)
    if alarms:
        return _run_node_stream_alarms(
            fn, u, names, n_src, out_schema, state_schema, mk_state,
            initial_states, watermark,
        )
    seed_states = _seed_initial_states(initial_states)
    bad = [k for k, v in seed_states.items() if _is_alarm_seed(v)]
    if bad:
        raise ValueError(
            "initial_states carry pending-alarm blobs (run_node_with_"
            "states(keep_alarms=True)) — resume them with alarms=True; "
            f"the no-alarm runner would silently drop them (keys {bad[:3]})"
        )

    def _no_alarms(*_a, **_k):
        raise NotImplementedError(
            "alarms are batch-only on this path: pass alarms=True to "
            "run_node_stream for the event-time-timer streaming engine, "
            "or run_node over history then hand over via streaming.hybrid"
        )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored = state.get
            last = list(stored[:n_src])
            ustate = pickle.loads(bytes(stored[n_src]))
        elif key[0] in seed_states:
            last = [None] * n_src
            ustate = _copy.deepcopy(seed_states[key[0]])
        else:
            last = [None] * n_src
            ustate = mk_state()
        out = []
        chunks = list(pdfs)
        if chunks:
            for (ts, seq), updates in _collapse_cycles(chunks):
                ticked = {}
                for src, v in updates:
                    last[src] = v
                    ticked[names[src]] = True
                vals = {n: last[i] for i, n in enumerate(names)}
                cyc = NodeCycle(ts, int(seq), ustate, vals, ticked, _no_alarms)
                r = fn(cyc)
                if r is not NO_OUTPUT and r is not None:
                    out.append((key[0], ts, int(seq), r))
        state.update(tuple(last) + (pickle.dumps(ustate),))
        yield pd.DataFrame(out, columns=[KEY, TS, SEQ, VALUE])

    # the caller's watermark applies here too (late-data tolerance for
    # the state operator); the 0 default stays a no-op so the historic
    # no-watermark behavior of this path is unchanged
    if watermark:
        u = with_watermark(u, watermark)
    return u.groupBy(KEY).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _seed_initial_states(initial_states):
    """Normalize run_node_stream's hybrid-handover seed: per-key
    replay-terminal states (see run_node_with_states /
    run_hybrid_node). A DataFrame of (key, state binary) is collected
    HERE — a visible driver action, sized one pickled dict per key
    (bounded key sets; unbounded cardinality should resume from the
    streaming checkpoint instead)."""
    import pickle

    if initial_states is not None and not isinstance(initial_states, dict):
        initial_states = {
            r[0]: pickle.loads(bytes(r[1])) for r in initial_states.collect()
        }
    return initial_states or {}


def _is_alarm_seed(v):
    """run_node_with_states(keep_alarms=True) emits typed AlarmHandoff
    records — an isinstance check, so an arbitrary user state dict or
    tuple can never be misread as a handoff blob."""
    from ..core.noderun import AlarmHandoff

    return isinstance(v, AlarmHandoff)


def _collapse_cycles(chunks):
    """A key's microbatch chunks → engine cycles in (ts, seq) order,
    coincident multi-stream ticks collapsed to ONE cycle (batch
    align's rule) — the one implementation both streaming folds share.
    Returns [((ts, seq), [(src, value), ...]), ...]."""
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        [TS, SEQ, "__src"]
    )
    # __src < 0 rows are group-materialization seeds (alarm handover),
    # not input ticks
    pdf = pdf[pdf["__src"] >= 0]
    cycles: "list[tuple]" = []
    cur = None
    for ts, seq, src, v in zip(pdf[TS], pdf[SEQ], pdf["__src"], pdf[VALUE]):
        if cur is None or (ts, seq) != cur[0]:
            cur = ((ts, seq), [])
            cycles.append(cur)
        cur[1].append((int(src), float(v)))
    return cycles


def _run_node_stream_alarms(
    fn, u, names, n_src, out_schema, state_schema, mk_state,
    initial_states, watermark,
):
    """The alarms=True engine behind :func:`run_node_stream` (see its
    docstring for the semantics and the transformWithStateInPandas
    note). State row: n_src last-value doubles + ONE pickle of
    ``(ustate, heap, order, fired)`` — heap entries are
    ``(pd.Timestamp, order, handle)`` exactly as the batch runner's
    (core/noderun.py:223); pickling user state and heap together keeps
    handle identity across the state store, so cancel_alarm on a
    stored handle still kills the heap entry. ``fired`` persists only
    to keep alarm-cycle seqs unique and batch-matching; the
    _MAX_ALARM_CYCLES runaway guard applies PER WAKE, as in one batch
    replay — a long-lived query never exhausts a lifetime budget.

    Handover: seed ``initial_states`` from ``run_node_with_states(
    keep_alarms=True)`` and pending alarms CROSS the replay→live
    boundary — each seed is the engine's own (state, heap, order,
    fired) blob, so handles stored in the state dict still cancel, and
    alarm-cycle seqs continue where the replay stopped — including for
    keys that never receive a live input (a synthetic seed row
    materializes each alarm-carrying key's state in trigger 1, so the
    watermark alone fires them). A plain-dict seed (the
    default run_node_with_states shape) carries NO heap — alarms
    scheduled past the replay end were dropped there, and a guard like
    ``if 'rep' not in cycle.state`` over a stored handle will skip
    re-arming."""
    import heapq
    import pickle

    from ..core.noderun import (
        _ALARM_SEQ_BASE, _MAX_ALARM_CYCLES, NO_OUTPUT, NodeCycle,
    )

    seed_states = _seed_initial_states(initial_states)

    # a seeded key with PENDING alarms but no live input would never
    # materialize in the state store (applyInPandasWithState has no
    # initialState) — its alarms would sit unfired forever. Inject ONE
    # synthetic row per such key through a side file-stream union: the
    # fold drops it from cycle collapse (__src < 0) but the wake
    # creates the state row and arms the timeout. The row carries an
    # ancient fixed timestamp — it arrives in trigger 1 while the
    # watermark is still 0 (so it is not dropped as late) and can
    # never ADVANCE the watermark past legitimate live data.
    pending = [
        k for k, v in seed_states.items()
        if _is_alarm_seed(v) and any(e[2]["alive"] for e in v.heap)
    ]
    if pending:
        # (hybrid.seed_ticks is the same write-once-file-source trick,
        # but it seeds through the VALUE channel with SEED_SEQ rows;
        # these rows ride the node union's __src tag instead, so the
        # shapes don't share code. The temp dir lives as long as the
        # streaming query — same lifetime as seed_ticks' directory.)
        import tempfile

        spark = u.sparkSession
        seed_dir = tempfile.mkdtemp(prefix="csp_alarm_seed_")
        ancient = _dt.datetime(1970, 1, 1, 0, 0, 1)
        seed_rows = [(k, ancient, 0, -1, None) for k in pending]
        schema = (
            f"{KEY} string, {TS} timestamp, {SEQ} long, "
            f"__src int, {VALUE} double"
        )
        spark.createDataFrame(seed_rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(seed_dir)
        u = u.unionByName(
            spark.readStream.format("parquet").schema(u.schema)
            .load(seed_dir)
        )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        timed_out = state.hasTimedOut
        if state.exists:
            stored = state.get
            last = list(stored[:n_src])
            ustate, heap, order0, fired0 = pickle.loads(bytes(stored[n_src]))
        elif key[0] in seed_states:
            seed = seed_states[key[0]]
            if _is_alarm_seed(seed):
                # replay handover with pending alarms
                # (run_node_with_states(keep_alarms=True)): ONE
                # deepcopy keeps handle identity between the copied
                # state dict and the copied heap; the replay's last
                # input values cross too (alarm cycles read inputs)
                s2 = _copy.deepcopy(seed)
                ustate, heap, order0, fired0 = (
                    s2.state, s2.heap, s2.order, s2.fired,
                )
                last = [(s2.last or {}).get(n) for n in names]
            else:
                last = [None] * n_src
                ustate, heap, order0, fired0 = (
                    _copy.deepcopy(seed), [], 0, 0,
                )
        else:
            last = [None] * n_src
            ustate, heap, order0, fired0 = (
                mk_state(), [], 0, 0,
            )
        order = [order0]
        fired = [fired0]   # cumulative: alarm-cycle seq numbering
        fired_now = [0]    # this wake only: the runaway guard's scope
        out = []

        def _schedule(ats, value):
            handle = {"alive": True, "value": value, "ts": ats}
            order[0] += 1
            heapq.heappush(heap, (pd.Timestamp(ats), order[0], handle))
            return handle

        def _emit(cyc, r):
            if r is not NO_OUTPUT and r is not None:
                out.append((key[0], cyc.now, cyc.seq, r))

        def _fire(limit_ts, inclusive):
            """Fire due alarms: ats < limit (input-cycle interleave —
            the batch runner's _fire_alarms rule, so a coincident
            alarm lands AFTER that timestamp's input cycles) or
            ats <= limit (watermark drain — the engine clock reached
            the alarm time)."""
            while heap and fired_now[0] < _MAX_ALARM_CYCLES:
                ats, _, handle = heap[0]
                if not handle["alive"]:
                    heapq.heappop(heap)
                    continue
                if limit_ts is not None and (
                    ats > limit_ts if inclusive else ats >= limit_ts
                ):
                    break
                heapq.heappop(heap)
                fired[0] += 1
                fired_now[0] += 1
                cyc = NodeCycle(
                    ats, _ALARM_SEQ_BASE + fired[0], ustate,
                    {n: last[i] for i, n in enumerate(names)}, {},
                    _schedule, alarm=handle["value"],
                )
                _emit(cyc, fn(cyc))

        if not timed_out:
            chunks = list(pdfs)
            if chunks:
                for (ts, seq), updates in _collapse_cycles(chunks):
                    _fire(ts, inclusive=False)
                    ticked = {}
                    for src, v in updates:
                        last[src] = v
                        ticked[names[src]] = True
                    vals = {n: last[i] for i, n in enumerate(names)}
                    cyc = NodeCycle(
                        ts, int(seq), ustate, vals, ticked, _schedule
                    )
                    _emit(cyc, fn(cyc))
        # drain alarms the engine clock (= the watermark) has reached —
        # on a timeout wake this is the whole reason we're here; after
        # input it catches alarms between the last row and the watermark
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            _fire(pd.Timestamp(wm_ms, unit="ms"), inclusive=True)
        # re-arm: ONE event-time timeout at the earliest live alarm
        # (must sit strictly past the current watermark)
        while heap and not heap[0][2]["alive"]:
            heapq.heappop(heap)
        state.update(
            tuple(last)
            + (pickle.dumps((ustate, heap, order[0], fired[0])),)
        )
        if heap:
            # wake 1 ms EARLY: Spark fires an event-time timeout only
            # when the watermark advances strictly BEYOND it, so a
            # timeout set AT the alarm time would miss a watermark that
            # lands exactly on it (batch `end` is inclusive — an alarm
            # at exactly the final watermark must fire). The early wake
            # at worst drains nothing and re-arms.
            next_ms = heap[0][0].value // 1_000_000
            state.setTimeoutTimestamp(max(next_ms - 1, wm_ms + 1))
        yield pd.DataFrame(out, columns=[KEY, TS, SEQ, VALUE])

    return with_watermark(u, watermark).groupBy(KEY).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
