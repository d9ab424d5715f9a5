"""csp.impl.wiring parity (csp/impl/wiring/__init__.py): the adapter
factory builders and wiring-time classes under their reference import
paths — one set of objects shared with the package top level."""

from ...sinks.publish import py_output_adapter_def  # noqa: F401
from ...sources.other import py_pull_adapter_def  # noqa: F401
from ..adaptermanager import py_managed_adapter_def  # noqa: F401
from ..pushadapter import py_push_adapter_def  # noqa: F401
from ..pushpulladapter import py_pushpull_adapter_def  # noqa: F401
from . import (  # noqa: F401
    adapters,
    context,
    delayed_edge,
    delayed_node,
    dynamic,
    edge,
    feedback,
    graph,
    node,
    outputs,
    runtime,
    special_output_names,
    threaded_runtime,
)
from .adapters import (  # noqa: F401
    PushMode,
    ReplayMode,
    input_adapter_def,
    output_adapter_def,
    status_adapter_def,
)
from .edge import Edge  # noqa: F401

# reference wiring/__init__ star-imports each submodule, so the
# callable exported by a submodule shadows the submodule itself
# (csp.impl.wiring.node is the module, csp.impl.wiring's `node` the
# decorator) — rebind in the same order
from .node import node  # noqa: F401,F811
from .graph import graph  # noqa: F401,F811
from .dynamic import dynamic  # noqa: F401,F811
from .feedback import feedback  # noqa: F401,F811
from .runtime import build_graph  # noqa: F401

__all__ = [
    "py_pull_adapter_def",
    "py_output_adapter_def",
    "py_managed_adapter_def",
    "py_push_adapter_def",
    "py_pushpull_adapter_def",
    "input_adapter_def",
    "output_adapter_def",
    "status_adapter_def",
    "Edge",
    "node",
    "build_graph",
]
