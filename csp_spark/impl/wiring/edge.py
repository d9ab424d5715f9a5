"""csp.impl.wiring.edge parity (csp/impl/wiring/edge.py): ``Edge`` is
this engine's TickStream — the reference's fluent edge surface
(dunder math, .pipe/.apply/.run) lives on it directly
(csp/dataframe.py:7 imports Edge from this path)."""

from ...core.ticks import TickStream as Edge  # noqa: F401
