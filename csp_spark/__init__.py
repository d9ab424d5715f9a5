"""csp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Point72/csp (reference read-only at
/root/reference), re-expressed Spark-first (SURVEY.md).

Core representation: the tick table (key, ts, seq, value); core kernel:
the align/as-of last-value join (csp_spark.core.align). Batch mode =
DataFrames over parquet (csp simulation); realtime = Structured
Streaming over the same logical ops (csp realtime).

The top level mirrors the reference's ``import csp`` surface
(reference csp/__init__.py:3-32 pulls in baselib.*, math.*, builtin
functions, Struct/Enum, stats) so a csp user can switch imports:
``csp.merge`` → ``csp_spark.merge``, ``csp.stats.mean`` →
``csp_spark.stats`` etc. Python-keyword collisions keep the
reference's spelling where legal (``filter``, ``print``, ``apply``
are plain attributes here) with underscore aliases alongside.
"""

from .core.session import get_spark
from .core.ticks import TickStream, KEY, TS, SEQ, VALUE, GLOBAL_KEY
from .core.align import (
    make_active,
    make_passive,
    align, align_wide, asof_join, binary_op, now, sample, ticked, valid,
)
from .core.enum import DynamicEnum, Enum
from .core.wiring import (
    ArgTypeMismatchError,
    TickSchemaError,
    TSArgTypeMismatchError,
    TypeMismatchError,
)
from .core.noderun import NO_OUTPUT, NodeCycle, run_node
from .core.profiler import Profiler, graph_info
from .core.record import Struct, UNSET
from .core.surface import (
    CspParseError,
    DelayedEdge,
    DynamicBasket,
    OutputBasket,
    Outputs,
    OutputTypeError,
    PushMode,
    ReplayMode,
    add_graph_output,
    build_graph,
    clear_global_context,
    feedback,
    graph,
    new_global_context,
    node,
    numba_node,
    set_print_full_exception_stack,
    ts,
)
from .frame import TsFrame
from .frame import TsFrame as DataFrame  # csp.DataFrame reference name
from .plans.runtime import (
    attached,
    engine_end_time,
    engine_start_time,
    engine_window,
    in_realtime,
    is_configured_realtime,
    csp_memoized,
    dynamic_apply,
    feedback_iterate,
    feedback_scan,
    memoize,
    run,
    run_on_thread,
    schedule_on_engine_stop,
    show_graph,
    snap,
    snapkey,
    ThreadRunner,
)
from .plans.runtime import dynamic  # csp.dynamic (reference + spark forms)
from .plans.runtime import attached as attach  # csp.attach reference name

# --- baselib surface (reference csp/baselib.py __all__) ---------------
from .operators.baselib import (
    DelayedCollect,
    DelayedDemultiplex,
    accum,
    apply_,
    burst,
    cast_int_to_float,
    collect,
    const,
    count,
    curve,
    default,
    delay,
    demultiplex,
    diff,
    drop_dups,
    drop_nans,
    dynamic_cast,
    dynamic_collect,
    exprtk,
    filter_,
    firstN,
    flatten,
    gate,
    get_basket_field,
    last_value,
    merge,
    multiplex,
    null_ts,
    split,
    static_cast,
    struct_collectts,
    struct_field,
    struct_fromts,
    timer,
    times,
    times_ns,
    unroll,
    wrap_feedback,
)
from .operators.baselib import dynamic_demultiplex  # key-stream dynamic basket, see baselib docstring
from .operators.baselib import count as num_ticks  # csp.num_ticks = tick counter
from .operators.history import (
    DuplicatePolicy,
    TimeIndexPolicy,
    item_at,
    items_at,
    set_buffering_policy,
    time_at,
    times_at,
    value_at,
    values_at,
)
from .operators.alarms import alarm_stream, cancel_alarm, schedule_alarm
from .sinks.publish import (
    LogSettings,
    log_ticks,
    print_ticks,
    stop_engine_limit,
)
from .streaming.sources import PushAdapter, PushGroup, PushPullAdapter

# reference spellings that are Python builtins/keywords — legal as
# module attributes, so expose both names (csp.filter / csp.print / …)
filter = filter_  # noqa: A001
apply = apply_  # noqa: A001

# reference-signature compatibility (core/refcompat.py): the exported
# const/curve/print also accept the reference's engine-ambient forms
# (csp.const(1.0), csp.curve(float, [...]), csp.print(tag, x)) so
# reference examples run verbatim; the explicit spark-first forms
# keep working unchanged.
from .core.refcompat import const, curve, exprtk, null_ts, timer  # noqa: E402,F811
from .core.refcompat import print_ticks as _print_compat  # noqa: E402

print = _print_compat  # noqa: A001
print_ticks = _print_compat
log = log_ticks
stop_engine = stop_engine_limit
# GenericPushAdapter dispatches on its first argument: a TYPE gets the
# reference capture-mode adapter (impl/pushadapter.py), a SparkSession
# the Structured Streaming live-ingest PushAdapter
from .impl.pushadapter import GenericPushAdapter  # noqa: E402

# --- math surface (reference csp/math.py __all__) ---------------------
from .operators.math_ops import (  # noqa: E402
    abs_,
    add,
    and_,
    arccos,
    arccosh,
    arcsin,
    arcsinh,
    arctan,
    arctanh,
    bitwise_not,
    cos,
    cosh,
    divide,
    eq,
    erf,
    exp,
    exp2,
    floordiv,
    ge,
    gt,
    le,
    ln,
    log2,
    log10,
    lt,
    max_,
    min_,
    mod,
    multiply,
    ne,
    neg,
    not_,
    or_,
    pos,
    pow_,
    sin,
    sinh,
    sqrt,
    sub,
    tan,
    tanh,
)

abs = abs_  # noqa: A001
min = min_  # noqa: A001
max = max_  # noqa: A001
pow = pow_  # noqa: A001

# --- subpackage namespaces mirroring csp.<pkg> ------------------------
from . import stats  # noqa: E402,F401  (csp.stats)
from . import random  # noqa: E402,F401,A004  (csp.random)
from . import adapters  # noqa: E402,F401  (csp.adapters)
from . import dedup, text, similarity, multimodal, pipeline  # noqa: E402,F401
from . import utils  # noqa: E402,F401  (csp.utils dev tooling)
from . import profiler  # noqa: E402,F401  (from csp import profiler)
# Reference-path submodules (csp.baselib / csp.basketlib / csp.curve /
# csp.dataframe / csp.math): import them here so the later attribute
# rebinds below keep the package-level FUNCTION names (curve, math ops)
# authoritative — the same module-vs-name shadowing order the reference
# relies on in csp/__init__.py. `import csp.curve` after this point is
# a sys.modules hit and never clobbers the function attribute.
import importlib as _importlib  # noqa: E402

for _sub in ("baselib", "basketlib", "curve", "dataframe", "math"):
    # `from . import curve` would short-circuit on the same-named
    # function attribute and never load the module file
    _importlib.import_module(f".{_sub}", __name__)
del _sub
from .core.refcompat import curve  # noqa: E402,F811  (rebind: function wins)

from .alias import enable_reference_alias  # noqa: E402,F401  (import csp → here)
from .pandas_ext import TsArray, TsDtype  # noqa: E402  (registers .csp/.to_csp accessors)

# --- node-grammar intrinsics as module attributes ---------------------
# The reference exposes every builtin (csp/impl/builtin_functions.py)
# at module level; the node-only ones raise outside a node body. Our
# AST translator (core/nodeparse.py) rewrites these calls inside
# @csp.node bodies before execution, so these shims only fire on
# misuse — with the reference's message shape.


def _node_only(name):
    def _shim(*args, **kwargs):
        raise RuntimeError(
            f"Unexpected use of csp.{name}, csp.{name} can only be "
            "used inside a node"
        )

    _shim.__name__ = name
    _shim.__qualname__ = name
    _shim.__doc__ = f"csp.{name} — valid only inside a @csp.node body."
    return _shim


alarm = _node_only("alarm")


def output(*args, **kwargs):
    """csp.output — inside a @csp.node body the AST translator
    rewrites this call before execution, so reaching this function
    means GRAPH-level use (reference impl/wiring/graph.py Outputs
    support: ``return csp.output(sum=..., carry=...)``): named edges
    pack into the node-outputs container so ``.sum`` attribute access
    works on the graph's return value; a single positional edge passes
    through."""
    if kwargs and not args:
        from .core.nodeparse import NodeOutputs

        return NodeOutputs(kwargs)
    if len(args) == 1 and not kwargs:
        return args[0]
    raise RuntimeError(
        "csp.output at graph level takes named outputs "
        "(csp.output(a=..., b=...)) or a single positional value"
    )
state = _node_only("state")
alarms = _node_only("alarms")
start = _node_only("start")
stop = _node_only("stop")
engine_stats = _node_only("engine_stats")
remove_dynamic_key = _node_only("remove_dynamic_key")


def set_capture_cpp_backtrace(enable: bool = True) -> None:
    """Reference debugging toggle for its C++ engine backtraces — a
    validated no-op here (there is no C++ engine; Spark surfaces JVM
    stack traces in its own logs)."""
    if not isinstance(enable, bool):
        raise TypeError("enable must be a bool")


#: reference csp/impl/builtin_functions.py:9 — the builtin registry,
#: same keys, mapped onto this package's equivalents
ALL_CSP_BUILTIN_FUNCS = {
    "num_ticks": num_ticks, "ticked": ticked, "valid": valid,
    "make_passive": make_passive, "make_active": make_active,
    "value_at": value_at, "time_at": time_at, "item_at": item_at,
    "values_at": values_at, "times_at": times_at, "items_at": items_at,
    "set_buffering_policy": set_buffering_policy,
    "alarm": alarm, "schedule_alarm": schedule_alarm,
    "cancel_alarm": cancel_alarm, "now": now,
    "remove_dynamic_key": remove_dynamic_key,
    "in_realtime": in_realtime,
    "engine_start_time": engine_start_time,
    "engine_end_time": engine_end_time,
    "is_configured_realtime": is_configured_realtime,
    "set_capture_cpp_backtrace": set_capture_cpp_backtrace,
    "output": output, "state": state, "alarms": alarms,
    "start": start, "stop": stop, "engine_stats": engine_stats,
}

__version__ = "0.2.0"
__all__ = [
    # core
    "get_spark", "TickStream", "align", "align_wide", "sample",
    "binary_op", "asof_join", "ticked", "valid", "now", "num_ticks",
    "KEY", "TS", "SEQ", "VALUE", "GLOBAL_KEY",
    "Profiler", "graph_info", "Struct", "UNSET", "TsFrame", "Enum", "DynamicEnum",
    # reference top-level surface shims (core/surface.py)
    "CspParseError", "DataFrame", "DelayedEdge", "DynamicBasket",
    "OutputBasket", "Outputs", "OutputTypeError", "PushMode", "ReplayMode",
    "add_graph_output", "attach", "build_graph", "clear_global_context",
    "dynamic", "feedback", "graph", "new_global_context", "node",
    "numba_node", "set_print_full_exception_stack", "ts",
    "run_node", "NodeCycle", "NO_OUTPUT",
    "run", "run_on_thread", "memoize", "csp_memoized", "show_graph",
    "ThreadRunner", "dynamic_apply", "feedback_iterate", "feedback_scan",
    "snap", "snapkey", "attached", "schedule_on_engine_stop",
    # baselib
    "DelayedCollect", "DelayedDemultiplex", "accum", "apply", "apply_",
    "burst", "cast_int_to_float", "collect", "const", "count", "curve",
    "default", "delay", "demultiplex", "diff", "drop_dups", "drop_nans",
    "dynamic_cast", "dynamic_collect", "dynamic_demultiplex", "exprtk",
    "filter", "filter_", "firstN", "flatten", "gate", "get_basket_field",
    "last_value", "merge", "multiplex", "null_ts", "split", "static_cast",
    "struct_collectts", "struct_field", "struct_fromts", "timer", "times",
    "times_ns", "unroll", "wrap_feedback",
    "value_at", "time_at", "item_at", "values_at", "times_at", "items_at",
    "DuplicatePolicy", "TimeIndexPolicy", "ALL_CSP_BUILTIN_FUNCS",
    "set_buffering_policy", "schedule_alarm", "alarm_stream", "cancel_alarm",
    "make_passive", "make_active", "engine_start_time", "engine_end_time",
    "in_realtime", "is_configured_realtime",
    "alarm", "output", "state", "alarms", "start", "stop",
    "engine_stats", "remove_dynamic_key", "set_capture_cpp_backtrace",
    "LogSettings", "log", "log_ticks", "print", "print_ticks",
    "stop_engine", "stop_engine_limit",
    "PushAdapter", "GenericPushAdapter", "PushGroup", "PushPullAdapter",
    # math
    "abs", "abs_", "add", "and_", "arccos", "arccosh", "arcsin",
    "arcsinh", "arctan", "arctanh", "bitwise_not", "cos", "cosh",
    "divide", "eq", "erf", "exp", "exp2", "floordiv", "ge", "gt", "le",
    "ln", "log2", "log10", "lt", "max", "max_", "min", "min_", "mod",
    "multiply", "ne", "neg", "not_", "or_", "pos", "pow", "pow_", "sin",
    "sinh", "sqrt", "sub", "tan", "tanh",
    # subpackages
    "stats", "random", "adapters", "dedup", "text", "similarity",
    "multimodal", "pipeline",
]
