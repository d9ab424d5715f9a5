"""csp.run parity — the thin graph-building + execution harness.

Reference lifecycle (SURVEY.md §3): ``csp.run(graph_fn, starttime=,
endtime=)`` wires the graph (Python calls building a DAG), builds the
engine, executes, and returns ``{output: [(time, value), ...]}``
(csp/impl/wiring/runtime.py:160-220). Our wiring is plain Python
building lazy DataFrames; Catalyst is the engine build; collection is
the action. Graph pruning and memoized wiring (CSP-Graph.md:52-58;
impl/mem_cache.py) come free — unreferenced DataFrames never execute,
shared lineage is analyzed once.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable, Mapping

from pyspark.sql import functions as F

from ..core.ticks import KEY, SEQ, TS, TickStream


def _clip(x: TickStream, start, end) -> TickStream:
    df = x.df
    if start is not None:
        df = df.filter(F.col(TS) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(TS) <= F.lit(end))
    return x.with_df(df)


def run(
    graph_fn: Callable[..., Mapping[str, TickStream] | TickStream],
    *args: Any,
    starttime: _dt.datetime | None = None,
    endtime: _dt.datetime | None = None,
    output_numpy: bool = False,
    **kwargs: Any,
) -> dict[str, list[tuple]]:
    """Execute a graph function over [starttime, endtime].

    ``graph_fn(*args, **kwargs)`` returns a TickStream (output key "0",
    like csp's positional outputs) or a dict of named TickStreams.
    Returns {name: [(ts, value)]} in engine order; ``output_numpy``
    returns {name: (times_array, values_array)} (runtime.py:86-87
    output_numpy parity).
    """
    outs = graph_fn(*args, **kwargs)
    if isinstance(outs, TickStream):
        outs = {"0": outs}
    result: dict[str, list[tuple]] = {}
    for name, stream in outs.items():
        ticks = _clip(stream, starttime, endtime).collect_ticks()
        if output_numpy:
            import numpy as np

            result[name] = (
                np.array([t for t, _ in ticks], dtype="datetime64[us]"),
                np.array([v for _, v in ticks]),
            )
        else:
            result[name] = ticks
    return result


# ----------------------------------------------------------------------
# feedback — driver-side fixed point (SURVEY.md §7.4 item 4)
# ----------------------------------------------------------------------

def feedback_iterate(
    step: Callable[[TickStream], TickStream],
    init: TickStream,
    max_iters: int = 50,
) -> TickStream:
    """csp.feedback analog (csp/impl/wiring/feedback.py; engine
    Feedback.h): the reference re-injects a node's output one engine
    cycle later at the same timestamp, converging within the cycle
    loop. Spark has no cyclic dataflow, so we iterate the whole batch
    plan to a fixed point on the driver: step() is applied until its
    output stops changing (checksum compare), materializing each
    round (localCheckpoint) so lineage doesn't grow unboundedly.

    Suits iterative-refinement graphs (label propagation, clamped
    accumulators). Per-cycle realtime feedback is out of scope and
    documented as a semantic delta."""
    cur = TickStream(init.df.localCheckpoint(eager=True), init.value_col)

    def _sig(s: TickStream) -> tuple:
        agg = s.df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(KEY, TS, SEQ, s.value_col).cast("decimal(28,0)")).alias("h"),
        ).collect()[0]
        return (agg["n"], agg["h"])

    last = _sig(cur)
    for _ in range(max_iters):
        nxt = step(cur)
        nxt = TickStream(nxt.df.localCheckpoint(eager=True), nxt.value_col)
        sig = _sig(nxt)
        if sig == last:
            return nxt
        cur, last = nxt, sig
    return cur


# ----------------------------------------------------------------------
# dynamic graphs — per-key subgraphs (SURVEY.md §2.8 'dynamic graphs')
# ----------------------------------------------------------------------

def dynamic_apply(
    x: TickStream,
    fn: Callable,
    output_schema: str,
) -> TickStream:
    """csp.dynamic analog (csp/impl/wiring/dynamic.py:12-100;
    DynamicEngine.cpp): the reference spawns a sub-graph per basket key
    at runtime; Spark is data-parallel over keys already, so a dynamic
    graph is ``groupBy(key).applyInPandas`` — ``fn(pdf)`` receives one
    key's ticks in engine order and returns that key's output table
    (must include key/ts/seq columns per ``output_schema``)."""

    def _per_key(pdf):
        return fn(pdf.sort_values([TS, SEQ]))

    out = x.df.groupBy(KEY).applyInPandas(_per_key, schema=output_schema)
    return TickStream(out)
