"""csp.impl.wiring.adapters parity (csp/impl/wiring/adapters.py).

The reference distinguishes ``*_adapter_def`` (C++-backed impls) from
``py_*_adapter_def`` (Python impls). This engine has exactly one kind
of adapter impl — Python classes lowered onto Spark plans — so the
unprefixed builders are the py_* builders."""

from ...core.surface import PushMode, ReplayMode, add_graph_output  # noqa: F401
from ...sinks.publish import py_output_adapter_def  # noqa: F401
from ...sources.other import py_pull_adapter_def  # noqa: F401
from ..adaptermanager import py_managed_adapter_def  # noqa: F401
from ..pushadapter import py_push_adapter_def  # noqa: F401
from ..pushpulladapter import py_pushpull_adapter_def  # noqa: F401

input_adapter_def = py_pull_adapter_def
output_adapter_def = py_output_adapter_def


def status_adapter_def(manager, ts_type=None, push_mode=None):
    """Reference adapters.py:216 — the engine-status edge of an adapter
    manager (ticks csp.adapters.status.Status on async adapter errors).
    A manager exposing ``status_stream()`` supplies its own edge; the
    default is a typed never-ticking edge — this engine's sources are
    plan-time objects whose failures raise synchronously at the action,
    so a healthy run has no status ticks to deliver."""
    get = getattr(manager, "status_stream", None)
    if callable(get):
        return get()
    from ...adapters.status import Status
    from ...core.refcompat import null_ts

    return null_ts(ts_type if ts_type is not None else Status)
