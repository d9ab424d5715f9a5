"""Top-level API-surface parity shims: the remaining names a reference
user imports from ``csp`` that map onto existing machinery here rather
than new operators (reference csp/__init__.py export list).

Each shim is real behavior, not a stub — but several document a
deliberate model delta: our wiring is eager DataFrame construction,
so constructs whose whole point is *build-order freedom* (feedback
bound after use, DelayedEdge) support the bind-first order natively
and raise precise errors for use-before-bind, pointing at the
fixed-point machinery (plans/runtime.feedback_scan / feedback_iterate)
that covers true cycles.

Not shimmed (C++-build-only surface, no Spark meaning):
``get_include_path`` / ``get_lib_path`` (reference csp/__init__.py
exposes the bundled C++ headers/libs for compiling cppimpl nodes).
"""

from __future__ import annotations

from enum import IntEnum
from typing import Any, Callable, Mapping

from .ticks import TickStream
from .wiring import TypeMismatchError


class PushMode(IntEnum):
    """Reference csp/impl/types/common_definitions.py:274-289. The
    behaviors live in operators/baselib.py (`last_value`, `burst`,
    default (ts, seq) order = NON_COLLAPSING) and streaming/ops.py
    (`conflate_last_value`, `burst_stream`); this enum is the
    selector constant reference code passes around."""

    LAST_VALUE = 1
    NON_COLLAPSING = 2
    BURST = 3


class ReplayMode(IntEnum):
    """Reference common_definitions.py:292-303 — PushPull replay
    policy; consumed by streaming/sources.PushPullAdapter-style
    hybrid replay (streaming/hybrid.py chooses the replay span)."""

    EARLIEST = 1
    LATEST = 2
    START_TIME = 3


class ts:
    """Annotation marker: ``ts[int]`` in reference signatures
    (csp/impl/types/tstype.py:11-60). Wiring here passes TickStreams
    whose element type lives in the DataFrame schema; the subscripted
    form retains its element type (``__csp_elem__``) so the
    reference-node translator (core/nodeparse.py) can derive output
    schemas from ``-> ts[float]`` / ``csp.Outputs(...)`` annotations."""

    __csp_elem__: Any = None

    def __class_getitem__(cls, item: Any) -> Any:
        return type(
            f"ts[{getattr(item, '__name__', item)}]",
            (cls,),
            {"__csp_elem__": item},
        )


class DynamicBasket:
    """Annotation marker for ``DynamicBasket[K, V]`` / ``Dict[ts[K],
    ts[V]]`` (tstype.py:64-72). Runtime form here is the long-format
    keyed TickStream (SURVEY §1.3)."""

    def __class_getitem__(cls, item: Any) -> Any:
        return cls


def Outputs(**kwargs: Any) -> dict:
    """Reference ``csp.Outputs(a=..., b=...)`` names a node/graph's
    outputs; our graphs return plain dicts of TickStreams, so this is
    exactly the dict constructor (keyword form keeps reference code
    source-compatible)."""
    return dict(kwargs)


class OutputBasketMarker:
    """A declared basket-shaped node output: element annotation +
    the name of the scalar argument carrying the key shape."""

    def __init__(self, typ: Any, shape: Any):
        self.typ = typ
        self.shape = shape


def OutputBasket(typ: Any, shape: Any = None, shape_of: Any = None) -> Any:
    """Reference OutputBasket annotation (impl/types/tstype.py):
    declares a basket-shaped output. With a ``shape``/``shape_of``
    argument (the reference's shape-from-scalar form, e.g.
    ``OutputBasket(Dict["K", ts["T"]], shape="keys")``) this returns a
    marker the node translator lowers onto per-key output channels —
    ``csp.output({key: value})`` in the body routes by runtime key.
    Without a shape the type passes through unchanged (the schema
    carries type info here)."""
    if shape is not None or shape_of is not None:
        return OutputBasketMarker(typ, shape or shape_of)
    return typ


class CspParseError(SyntaxError):
    """Reference csp/impl/error_handling.py: raised when @csp.node
    AST parsing fails. Our nodes are plain Python, so this surfaces
    only via explicit raises in reference-compatible code paths."""


class OutputTypeError(TypeMismatchError):
    """Reference impl/outputadapter.py type failures; here schema
    mismatches raise at wiring time via core/wiring.py checks."""


class DelayedEdge(TickStream):
    """csp.DelayedEdge (impl/wiring/delayed_edge.py:19-44): an edge
    placeholder bound later. Lazily delegates to the bound stream;
    any use before ``bind`` raises (or, with ``default_to_null=True``
    and a session, resolves to null_ts — the reference's default).

    Delta vs reference: wiring is eager here, so the placeholder must
    be bound before an operator *consumes* it (reference allows
    consuming first). For true cyclic topologies use
    plans/runtime.feedback_scan / feedback_iterate.
    """

    __slots__ = ("_bound", "_default_null")

    def __init__(self, typ: Any = None, default_to_null: bool = False,
                 spark=None):
        self._bound = None
        self._default_null = False
        if default_to_null:
            if spark is None:
                raise ValueError(
                    "default_to_null=True needs spark= to build null_ts"
                )
            from ..operators.baselib import null_ts

            vt = typ if isinstance(typ, str) else "double"
            self._bound = null_ts(spark, vt)
            self._default_null = True

    @property
    def df(self):
        return self._resolved().df

    @property
    def value_col(self):
        return self._resolved().value_col

    def _resolved(self) -> TickStream:
        if self._bound is None:
            raise RuntimeError(
                "DelayedEdge used before bind(); bind a stream first "
                "(or construct with default_to_null=True, spark=...)"
            )
        return self._bound

    def bind(self, stream: TickStream) -> None:
        if self._bound is not None and not self._default_null:
            raise RuntimeError(
                "Attempted to bind DelayedEdge multiple times"
            )
        self._bound = stream
        self._default_null = False

    def is_bound(self) -> bool:
        return self._bound is not None and not self._default_null


class _FeedbackOut(TickStream):
    """The edge returned by ``feedback.out()`` — resolves to the bound
    stream shifted one engine cycle (wrap_feedback's seq+1 contract).

    When a consumer materializes it BEFORE bind() (a true cycle: the
    graph wires a node on the feedback, and that node's output later
    binds it), resolution falls back to the PREVIOUS fixed-point
    pass's materialized ticks (empty on pass 0) and flags the handle
    stale — csp.run re-executes the graph until the bound ticks
    stabilize (plans/runtime.run's feedback loop)."""

    __slots__ = ("_fb",)

    def __init__(self, fb: "feedback"):
        self._fb = fb

    def _resolved(self) -> TickStream:
        from ..operators.baselib import wrap_feedback

        fb = self._fb
        if fb._bound is not None:
            return wrap_feedback(fb._bound)
        if fb._frame is not None:
            # inside csp.run: one-cycle-delayed replay of the previous
            # pass (empty on the first) — the run loop re-wires until
            # this converges
            fb._used_stale = True
            if fb._prev is not None:
                return wrap_feedback(fb._prev)
            return fb._empty_stream()
        raise RuntimeError(
            "csp.feedback.out() used before bind(). Bind the "
            "producing stream first; for graphs where the output "
            "truly feeds its own input, wire inside csp.run (the "
            "runner iterates feedback cycles to a fixed point) or use "
            "feedback_scan / feedback_iterate directly."
        )

    @property
    def df(self):
        return self._resolved().df

    @property
    def value_col(self):
        return self._resolved().value_col


class feedback:
    """csp.feedback (impl/wiring/feedback.py:39-80): a typed handle
    whose ``out()`` is the bound stream delivered one engine cycle
    later at the same timestamp — exactly wrap_feedback's (ts, seq+1)
    contract. ``bind`` may be called once.

    True graph cycles (out() consumed before bind()) are resolved by
    csp.run's fixed-point loop: handles register on the run frame in
    creation order, each pass re-wires the graph with the previous
    pass's materialized feedback ticks, and the loop stops when the
    bound streams' ticks stop changing — the batch analog of the
    reference engine's one-cycle-delayed feedback delivery."""

    def __init__(self, typ: Any = None):
        self._type = typ
        self._bound: TickStream | None = None
        self._prev: TickStream | None = None
        self._used_stale = False
        self._frame: dict | None = None
        try:
            from ..plans.runtime import _run_info_stack

            self._frame = _run_info_stack[-1] if _run_info_stack else None
        except Exception:
            self._frame = None
        if self._frame is not None:
            fbs = self._frame.setdefault("feedbacks", [])
            idx = len(fbs)
            prevs = self._frame.get("fb_prev") or []
            if idx < len(prevs):
                self._prev = prevs[idx]
            fbs.append(self)

    def _empty_stream(self) -> TickStream:
        from .nodeparse import _elem_type
        from .session import get_spark

        ddl = _elem_type(self._type) if self._type is not None else "double"
        df = get_spark().createDataFrame(
            [], f"key string, ts timestamp, seq long, value {ddl}"
        )
        return TickStream(df)

    def bind(self, x: TickStream) -> None:
        if self._bound is not None:
            raise RuntimeError("csp.feedback is already bound")
        self._bound = x

    def out(self) -> TickStream:
        return _FeedbackOut(self)


# ---------------------------------------------------------------------------
# graph build: decorators, side outputs, contexts


def graph(fn: Callable | None = None, *, memoize: bool = False):
    """@csp.graph (impl/wiring/graph.py): graphs here are plain
    Python functions over TickStreams (SURVEY §2.9 mapping), so the
    decorator is the identity — plus the reference's per-signature
    wiring memoization when asked (memoize=True ≈ the reference
    default of caching identical instantiations; opt-in here because
    lru_cache requires hashable args)."""

    def deco(f: Callable) -> Callable:
        if memoize:
            from ..plans.runtime import memoize as _memo

            f = _memo(f)
        f.__csp_graph__ = True
        return f

    return deco(fn) if fn is not None else deco


def node(fn: Callable | None = None, **_kw: Any):
    """@csp.node (impl/wiring/node.py): marks a per-tick callable.

    Two accepted styles:
    - imperative run_node style (``def f(cycle): ...``) — returned
      as-is for run_node / dynamic_apply / feedback_scan;
    - REFERENCE style (ts[...]-annotated params, ``with csp.state()``
      blocks, ``csp.ticked/valid/output``) — calling the decorated
      function with TickStream args WIRES a node: the body is AST-
      lowered onto run_node (core/nodeparse.py, the thin analog of
      the reference's node_parser.py), so reference node definitions
      run unmodified. Reference-only options (cppimpl, memoize) are
      ignored."""

    def deco(f: Callable) -> Callable:
        from .nodeparse import is_reference_node, wire_reference_node

        if is_reference_node(f):
            import functools

            @functools.wraps(f)
            def wired(*args: Any, **kwargs: Any):
                return wire_reference_node(f, *args, **kwargs)

            wired.__csp_node__ = True
            wired.__wrapped__ = f
            return wired
        f.__csp_node__ = True
        return f

    return deco(fn) if fn is not None else deco


numba_node = node  # reference @csp.numba_node: JIT superseded by Arrow batching


_output_ctx: list[dict] = []
#: tick_history specs per output context, keyed by id(ctx dict) —
#: consumed by run()/build_graph when the context pops
import collections as _collections

_output_history: "dict[int, dict]" = _collections.defaultdict(dict)


def _history_clip(x, hist, end=None):
    """Trailing tick_history window over a stream: anchored at ``end``
    (the run's endtime) when given, else at the stream's own max ts
    via a lazy global-window max (no wiring-time action)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from .ticks import TS

    df = x.df
    if end is not None:
        df = df.filter(F.col(TS) >= F.lit(end - hist))
    else:
        w = Window.partitionBy()
        df = (
            df.withColumn("__maxts", F.max(TS).over(w))
            .filter(F.col(TS) >= F.col("__maxts") - F.lit(hist))
            .drop("__maxts")
        )
    return x.with_df(df)


def add_graph_output(key: str, x: TickStream, tick_count: int = -1,
                     tick_history=None) -> None:
    """csp.add_graph_output (impl/wiring/runtime.py; CSP-Graph.md:63-110):
    register a side output while a graph function is being built under
    ``run``/``build_graph``. tick_count bounds the collected history
    to the trailing N ticks per key (tick_history: trailing duration)."""
    if not _output_ctx:
        raise RuntimeError(
            "add_graph_output called outside run()/build_graph()"
        )
    if tick_count != -1 or tick_history is not None:
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window
        from .ticks import KEY, TS, SEQ

        df = x.df
        if tick_count != -1:
            w = Window.partitionBy(KEY).orderBy(
                F.col(TS).desc(), F.col(SEQ).desc()
            )
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= tick_count)
                .drop("__rn")
            )
        x = x.with_df(df)
    if tick_history is not None:
        # DEFERRED: the trailing window anchors to the RUN's endtime
        # (run() applies it after clipping), falling back to the
        # stream's own max ts for unbounded build_graph use — and
        # never as an eager Spark action at wiring time
        _output_history[id(_output_ctx[-1])][key] = tick_history
    _output_ctx[-1][key] = x


def build_graph(fn: Callable, *args: Any, **kwargs: Any) -> dict:
    """Wire a graph function without executing it: returns the dict of
    named output TickStreams (returned ∪ add_graph_output-registered).
    The reference's build step resolves types and ranks; here the
    analogue — Catalyst analysis — happens lazily on first action."""
    _output_ctx.append({})
    try:
        outs = fn(*args, **kwargs)
    finally:
        side = _output_ctx.pop()
        hist = _output_history.pop(id(side), {})
    if outs is None:
        outs = {}
    elif isinstance(outs, TickStream):
        outs = {"0": outs}
    else:
        outs = dict(outs)
    for k, v in side.items():
        if k in outs:
            raise ValueError(f"duplicate graph output key {k!r}")
        outs[k] = _history_clip(v, hist[k]) if k in hist else v
    return outs


class new_global_context:
    """Reference csp.impl.mem_cache.new_global_context: a context in
    which memoized wiring is cached; exiting (or
    clear_global_context()) drops the caches. Our memoize() registers
    every lru_cache it creates; this clears them, releasing the
    cached DataFrame plans."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        clear_global_context()
        return False


def clear_global_context() -> None:
    from ..plans import runtime as _rt

    for cache in _rt._memo_caches:
        cache.cache_clear()


_print_full_stack = [False]


def set_print_full_exception_stack(new_value: bool) -> bool:
    """Reference csp/impl/error_handling.py toggle. Spark/Py errors
    here always carry full tracebacks (there is no AST-rewritten frame
    machinery to abridge), so the flag only records the preference;
    kept for source compatibility. Returns the previous value, like
    the reference."""
    old = _print_full_stack[0]
    _print_full_stack[0] = bool(new_value)
    return old
