"""csp.impl.wiring.node parity (csp/impl/wiring/node.py): the @node
decorator under its defining-module path. ``_node_internal_use`` is
the reference's internal alias used by csp/math.py and friends."""

from ...core.surface import node  # noqa: F401

_node_internal_use = node
