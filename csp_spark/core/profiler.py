"""csp.profiler parity (docs/wiki/api-references/csp.profiler-API.md:
17-30; csp/profiler.py; examples/99_developer_tools/e1_profiling.py:
31-36).

The reference wraps a run in ``with profiler.Profiler(): csp.run(...)``
and reports cycle_count, average_cycle_time, max_cycle_time,
utilization, and per-node executions/total_time/max_time. Spark's
execution units map onto that surface:

- engine cycle       → job (one action over the lazily-built graph)
- node               → stage (a codegen'd pipeline of operators)
- node execution     → task (one partition's run of a stage)

We scope the block with a unique job group so concurrent work in the
same session is excluded, and snapshot the status tracker on exit.
Wall-clock timing is driver-side (the public status tracker exposes
counts, not durations); utilization is completed-task parallelism
against the session's core budget.
"""

from __future__ import annotations

import time
import uuid
from typing import Any

from pyspark.sql import SparkSession


class ProfilerResults(dict):
    """The results mapping plus the reference's ``print_stats()``
    surface (csp/profiler.py ProfilerInfo.print_stats; used verbatim
    by examples/99_developer_tools/e1_profiling.py:35-36)."""

    def print_stats(self, sort_by: str = "total_time", max_nodes: int = 100):
        print("Profiling stats")
        for k in ("cycle_count", "average_cycle_time", "wall_time",
                  "utilization", "total_tasks", "completed_tasks"):
            print(f"  {k}: {self[k]}")
        print("  node_stats:")
        for sid, st in list(self["node_stats"].items())[:max_nodes]:
            print(f"    [{sid}] {st['name']}: executions={st['executions']}"
                  f" completed={st['completed']} failed={st['failed']}")


class GraphInfo(dict):
    """graph_info result plus the reference's ``print_info()``
    (csp/profiler.py GraphInfo.print_info)."""

    def print_info(self, sort_by: str = "count", max_nodes: int = 100):
        print("Graph info")
        print(f"  node_count: {self['node_count']}")
        print(f"  edge_count: {self['edge_count']}")
        print(f"  longest_path: {' -> '.join(self['longest_path'])}")
        print("  nodetype_counts:")
        for name, n in sorted(
            self["nodetype_counts"].items(), key=lambda kv: -kv[1]
        )[:max_nodes]:
            print(f"    {name}: {n}")


class Profiler:
    """``with Profiler(spark) as p: ...actions...`` then ``p.results()``.

    Results dict (reference field → ours):
    - cycle_count        → jobs executed in the block
    - average_cycle_time → wall_time / job_count (s)
    - utilization        → completed_tasks / (wall_time * cores)
      (≈ fraction of the core budget kept busy, like the reference's
      engine-busy ratio)
    - node_stats         → per-stage {name, executions (tasks),
      completed, failed}
    """

    def __init__(self, spark: SparkSession | None = None):
        # the reference form takes no session (e1_profiling.py:31
        # ``with profiler.Profiler() as p``) — default to the active one
        if spark is None:
            spark = SparkSession.getActiveSession()
            if spark is None:
                from .session import get_spark

                spark = get_spark()
        self._spark = spark
        self._group = f"csp_profiler_{uuid.uuid4().hex[:12]}"
        self._t0 = 0.0
        self.results_dict: dict[str, Any] | None = None

    def __enter__(self) -> "Profiler":
        sc = self._spark.sparkContext
        sc.setJobGroup(self._group, "csp_spark profiler block")
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        wall = time.perf_counter() - self._t0
        sc = self._spark.sparkContext
        tracker = sc.statusTracker()
        job_ids = sorted(tracker.getJobIdsForGroup(self._group))
        stage_ids: set[int] = set()
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is not None:
                stage_ids.update(info.stageIds)
        node_stats = {}
        total_tasks = completed_tasks = 0
        for s in sorted(stage_ids):
            si = tracker.getStageInfo(s)
            if si is None:
                continue
            node_stats[s] = {
                "name": si.name,
                "executions": si.numTasks,
                "completed": si.numCompletedTasks,
                "failed": si.numFailedTasks,
            }
            total_tasks += si.numTasks
            completed_tasks += si.numCompletedTasks
        cores = sc.defaultParallelism
        n_jobs = len(job_ids)
        self.results_dict = ProfilerResults({
            "wall_time": wall,
            "cycle_count": n_jobs,
            "average_cycle_time": (wall / n_jobs) if n_jobs else 0.0,
            "utilization": (
                min(1.0, completed_tasks / (wall * cores)) if wall > 0 else 0.0
            ),
            "total_tasks": total_tasks,
            "completed_tasks": completed_tasks,
            "node_stats": node_stats,
        })
        sc.setJobGroup("", "")

    def results(self) -> dict[str, Any]:
        if self.results_dict is None:
            raise RuntimeError("Profiler block has not exited yet")
        return self.results_dict


def graph_info(df) -> dict[str, Any]:
    """csp.profiler.graph_info parity (reference csp/profiler.py:130-200):
    static statistics of a wired graph. Here the graph IS the Catalyst
    plan of a DataFrame (or TickStream), so:

    - node_count       → optimized-plan operator count
    - edge_count       → parent links between plan operators
    - nodetype_counts  → operator-class histogram (Project, Filter,
                         Join, Aggregate, Window, ...)
    - longest_path     → operator names along the deepest lineage chain
                         (the reference's critical path through the DAG)

    Accepts a DataFrame, a TickStream, or — reference form
    (e1_profiling.py:25 ``profiler.graph_info(graph1)``) — a GRAPH
    FUNCTION, which is wired (not executed) and whose outputs'
    optimized plans are aggregated (shared subplans count once per
    output they feed, like the reference's per-edge accounting)."""
    if callable(df) and not hasattr(df, "df") and not hasattr(df, "_jdf"):
        from . import surface as _surface

        _surface._output_ctx.append({})
        try:
            outs = df()
        finally:
            side = _surface._output_ctx.pop()
            _surface._output_history.pop(id(side), {})
        if outs is None:
            outs = {}
        elif hasattr(outs, "df"):
            outs = {"0": outs}
        streams = {**dict(outs), **side}
        infos = [graph_info(s) for s in streams.values()]
        agg = GraphInfo({
            "node_count": sum(i["node_count"] for i in infos),
            "edge_count": sum(i["edge_count"] for i in infos),
            "nodetype_counts": {},
            "longest_path": max(
                (i["longest_path"] for i in infos), key=len, default=[]
            ),
        })
        for i in infos:
            for k, v in i["nodetype_counts"].items():
                agg["nodetype_counts"][k] = (
                    agg["nodetype_counts"].get(k, 0) + v
                )
        return agg
    plan = (
        df.df if hasattr(df, "df") else df
    )._jdf.queryExecution().optimizedPlan()

    def walk(node):
        name = node.nodeName()
        children = [node.children().apply(i) for i in range(node.children().size())]
        counts = {name: 1}
        nodes = 1
        edges = len(children)
        deepest: list[str] = []
        for ch in children:
            c_nodes, c_edges, c_counts, c_path = walk(ch)
            nodes += c_nodes
            edges += c_edges
            for k, v in c_counts.items():
                counts[k] = counts.get(k, 0) + v
            if len(c_path) > len(deepest):
                deepest = c_path
        return nodes, edges, counts, [name, *deepest]

    node_count, edge_count, nodetype_counts, longest = walk(plan)
    return GraphInfo({
        "node_count": node_count,
        "edge_count": edge_count,
        "nodetype_counts": nodetype_counts,
        "longest_path": longest,
    })
