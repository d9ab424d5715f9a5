"""``from csp import profiler`` parity (reference csp/profiler.py;
examples/99_developer_tools/e1_profiling.py): the Profiler context
manager and graph_info static inspector, re-exported from
core.profiler where they live with the runtime."""

from .core.profiler import GraphInfo, Profiler, ProfilerResults, graph_info

__all__ = ["GraphInfo", "Profiler", "ProfilerResults", "graph_info"]
