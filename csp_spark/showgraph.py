"""csp.showgraph parity (reference csp/showgraph.py): graph
visualization. The reference renders the wiring DAG via graphviz; here
the wiring IS the Catalyst plan, so the faithful "show" is the plan
itself — ``show_graph`` prints the formatted Spark plan of each
output stream, and ``generate_graph`` returns it as a bytes buffer
(the reference returns a PNG buffer). Image rendering (graphviz/PIL)
is out of scope (UI, SURVEY §2.2) but the import surface matches so
reference programs that ``import csp.showgraph`` run unmodified.
"""

from __future__ import annotations

import contextlib
import io
from typing import Any

__all__ = ["generate_graph", "show_graph"]


def generate_graph(graph_fn: Any, *args: Any, **kwargs: Any) -> io.BytesIO:
    """Text rendering of the wired graph's physical plans."""
    import datetime as _dt

    from .core.ticks import TickStream
    from .plans.runtime import _run_info_stack

    if callable(graph_fn) and not isinstance(graph_fn, TickStream):
        # same synthetic bounded frame plans/runtime.show_graph pushes:
        # ambient sources (csp.timer/csp.const) need engine bounds to
        # wire, and only the PLAN is rendered — keep the window small.
        # Skip when a frame is already active (csp.show_graph routes
        # here with its own frame pushed).
        pushed = not _run_info_stack
        if pushed:
            _run_info_stack.append(
                {"start": _dt.datetime(2000, 1, 1),
                 "end": _dt.datetime(2000, 1, 1, 1), "realtime": False}
            )
        try:
            out = graph_fn(*args, **kwargs)
        finally:
            if pushed:
                _run_info_stack.pop()
    else:
        out = graph_fn
    if isinstance(out, TickStream):
        out = {"0": out}
    buf = io.StringIO()
    for name, stream in (out or {}).items():
        buf.write(f"== {name} ==\n")
        with contextlib.redirect_stdout(buf):
            stream.df.explain("formatted")
        buf.write("\n")
    if not buf.getvalue():
        buf.write(
            "(graph returned no outputs — sink-only graphs evaluate "
            "their plans at run time; pass an edge or a graph that "
            "returns its outputs to render them)\n"
        )
    return io.BytesIO(buf.getvalue().encode())


def show_graph(graph_fn: Any, *args: Any, **kwargs: Any) -> None:
    print(generate_graph(graph_fn, *args, **kwargs).getvalue().decode())


from collections import namedtuple as _namedtuple

#: reference showgraph.py:6-7 — the rendering records show_graph emits
NODE = _namedtuple("NODE", ["name", "label", "color", "shape"])
EDGE = _namedtuple("EDGE", ["start", "end"])
