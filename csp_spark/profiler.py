"""``from csp import profiler`` parity (reference csp/profiler.py;
examples/99_developer_tools/e1_profiling.py): the Profiler context
manager and graph_info static inspector, re-exported from
core.profiler where they live with the runtime."""

from .core.profiler import GraphInfo, Profiler, ProfilerResults, graph_info

__all__ = ["GraphInfo", "Profiler", "ProfilerResults", "graph_info"]


import datetime as _dt
import pickle as _pickle

from .core.record import Struct as _Struct


class ProfilerInfo(_Struct):
    """reference csp/profiler.py:202-388 — the typed profiling record
    users persist and diff. Field-compatible with the reference struct;
    ``from_engine`` accepts this engine's ProfilerResults dict (same
    key names) or the reference's engine dict."""

    cycle_count: int
    average_cycle_time: float
    max_cycle_time: float
    utilization: float
    node_stats: dict
    build_time: float

    def from_engine(self, p: dict) -> "ProfilerInfo":
        self.cycle_count = int(p.get("cycle_count", 0))
        self.average_cycle_time = float(p.get("average_cycle_time", 0.0))
        self.max_cycle_time = float(
            p.get("max_cycle_time", p.get("average_cycle_time", 0.0))
        )
        self.utilization = float(p.get("utilization", 0.0))
        stats = dict(p.get("node_stats", {}))
        stats.pop("_profile", None)  # reference: hide the profiling node
        self.node_stats = stats
        return self

    def print_stats(self, sort_by: str = "total_time", max_nodes: int = 100):
        print("Profiling info")
        print(f"  cycle_count: {self.cycle_count}")
        print(f"  average_cycle_time: {self.average_cycle_time:.6f}s")
        print(f"  max_cycle_time: {self.max_cycle_time:.6f}s")
        print(f"  utilization: {self.utilization:.4f}")
        if not self.is_set("node_stats") or not self.node_stats:
            return
        reverse = sort_by != "name"
        items = sorted(
            self.node_stats.items(),
            key=(lambda kv: kv[0]) if sort_by == "name"
            else (lambda kv: kv[1].get(sort_by, 0)),
            reverse=reverse,
        )[:max_nodes]
        print("  node_stats:")
        for name, data in items:
            print(f"    {name}: {data}")

    def dump_stats(self, filename: str) -> None:
        with open(filename, "wb") as f:
            _pickle.dump(self.to_dict(), f)

    @classmethod
    def load_stats(cls, filename: str) -> "ProfilerInfo":
        with open(filename, "rb") as f:
            return cls.from_dict(_pickle.load(f))

    def max_time_node(self):
        return max(
            self.node_stats.items(), key=lambda x: x[1]["total_time"]
        )

    def max_exec_node(self):
        return max(
            self.node_stats.items(), key=lambda x: x[1]["executions"]
        )


def nullts():
    """reference profiler.py:512: a never-ticking edge (the profiler's
    default trigger)."""
    import csp_spark

    return csp_spark.null_ts(float)


def left_align(df):
    """reference profiler.py:50-56: pandas to_string formatters that
    left-align the object columns of a stats frame."""
    formatters = {}
    for col in df.select_dtypes("object"):
        len_max = int(df[col].str.len().max())
        formatters[col] = (
            lambda v, _w=len_max: f"{v:<{_w}s}"
        )
    return formatters


def write_image(handler, fig):
    """reference profiler.py:59-66: render a matplotlib figure as an
    inline base64 <img> into an HTTP handler (the profiler UI path;
    needs matplotlib at call time)."""
    import base64
    from io import BytesIO

    tmpfile = BytesIO()
    fig.tight_layout()
    fig.savefig(tmpfile, format="png")
    encoded = base64.b64encode(tmpfile.getvalue()).decode("utf-8")
    handler.write(f"<img src='data:image/png;base64,{encoded}'>")


class ProfilerUIHandler:
    """reference profiler.py ui handler (tornado-backed). The web UI
    stack isn't shipped in this environment; constructing raises with
    the same dependency message the reference effectively gives."""

    def __init__(self, *a, **kw):
        raise ImportError(
            "ProfilerUIHandler requires the tornado web stack; use "
            "ProfilerInfo.print_stats() / dump_stats() instead"
        )


__all__ += ["ProfilerInfo", "nullts", "left_align", "write_image",
            "ProfilerUIHandler"]
