"""Imperative node execution — the @csp.node authoring model, run
keyed-parallel (reference csp/impl/wiring/node.py + engine
cpp/csp/engine/CspEngine.cpp node-cycle loop).

A reference node is a per-tick Python function with ``csp.state()``
variables, ``csp.ticked``/``csp.valid`` input queries, and an optional
output per cycle. ``run_node`` gives the same authoring surface on
Spark: the inputs align to engine cycles (core/align.py — one row per
cycle with last-values and ticked flags), and the user's function runs
over each KEY's cycles sequentially inside ``applyInPandas``.

Scale shape: per-key sequential Python — the deliberate slow path,
exactly like the reference's Python nodes vs their cppimpl twins.
Keys are independent Arrow groups, so a 100-TB keyed stream
parallelizes across executors; the GLOBAL_KEY case runs one group
(same limit as the reference's single-threaded engine). Prefer the
combinator library (apply/exprtk/stats/feedback_scan) for hot paths —
this exists so imperative reference nodes port line-for-line.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Callable

import pandas as pd

from .align import _ticked as _ticked_col
from .align import align
from .ticks import KEY, SEQ, TS, VALUE, TickStream

#: return this from a node function to emit nothing this cycle
#: (returning None does the same — reference nodes tick only on
#: ``return``/``csp.output``)
NO_OUTPUT = object()


class NodeCycle:
    """One engine cycle as seen from inside a node: ``now``/``seq``,
    the mutable per-key ``state`` dict (csp.state), input last-values
    by name (``cycle['bid']``), and the reference's input queries
    ``ticked(name)`` / ``valid(name)``.

    Note: inputs arrive as pandas scalars; a float input that is not
    yet valid reads as NaN AND valid()==False — a stream that ticks
    literal NaN values is indistinguishable from invalid here (use
    drop_nans upstream if that matters).
    """

    __slots__ = ("now", "seq", "state", "_vals", "_ticked")

    def __init__(self, now, seq, state, vals, ticked):
        self.now = now
        self.seq = seq
        self.state = state
        self._vals = vals
        self._ticked = ticked

    def __getitem__(self, name: str):
        return self._vals[name]

    def ticked(self, name: str) -> bool:
        return bool(self._ticked[name])

    def valid(self, name: str) -> bool:
        v = self._vals[name]
        return v is not None and not (isinstance(v, float) and v != v)


def run_node(
    fn: Callable[[NodeCycle], Any],
    inputs: TickStream | Mapping[str, TickStream],
    state: Mapping[str, Any] | Callable[[], dict] | None = None,
    output_type: str = "double",
) -> TickStream:
    """Run an imperative per-cycle function over every key's engine
    cycles: ``fn(cycle)`` is called once per cycle in (ts, seq) order
    with that key's state dict carried across calls; its return value
    is the output tick (``NO_OUTPUT``/``None`` = no tick this cycle).

    ``inputs`` may be one stream (readable as ``cycle['x']``) or a
    dict of named streams; passive inputs (make_passive) update
    last-values without producing cycles, exactly as in align().
    ``state`` seeds the per-key state: a dict (copied per key) or a
    zero-arg factory.
    """
    streams = (
        {"x": inputs} if isinstance(inputs, TickStream) else dict(inputs)
    )
    names = list(streams)
    wide = align(streams, keep_ticked=True)
    mk_state = state if callable(state) else (lambda s=dict(state or {}): dict(s))
    schema = f"{KEY} string, {TS} timestamp, {SEQ} long, {VALUE} {output_type}"

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([TS, SEQ])
        st = mk_state()
        key = pdf[KEY].iloc[0]
        tcols = {n: pdf[_ticked_col(n)].to_numpy() for n in names}
        vcols = {n: pdf[n] for n in names}
        tss, seqs = pdf[TS], pdf[SEQ]
        out = []
        for i in range(len(pdf)):
            vals = {}
            for n in names:
                v = vcols[n].iloc[i]
                vals[n] = None if v is pd.NaT else v
            cyc = NodeCycle(
                tss.iloc[i], int(seqs.iloc[i]), st, vals,
                {n: tcols[n][i] for n in names},
            )
            r = fn(cyc)
            if r is not NO_OUTPUT and r is not None:
                out.append((key, tss.iloc[i], int(seqs.iloc[i]), r))
        return pd.DataFrame(out, columns=[KEY, TS, SEQ, VALUE])

    return TickStream(wide.groupBy(KEY).applyInPandas(_run, schema))
