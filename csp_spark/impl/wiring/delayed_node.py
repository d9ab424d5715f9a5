"""csp.impl.wiring.delayed_node parity (csp/impl/wiring/
delayed_node.py:6-21): the authoring ABC for output nodes whose
wiring is deferred to run time. This engine wires adapters eagerly
onto the logical plan, so subclasses register here and ``copy`` /
``_instantiate`` keep the reference contract for code structured
around the deferred pattern; ``instantiate_pending`` lets a runner
flush them explicitly."""

from abc import ABCMeta, abstractmethod

_PENDING: "list[DelayedNodeWrapperDef]" = []


class DelayedNodeWrapperDef(metaclass=ABCMeta):
    def __init__(self):
        self._nodedef = None
        _PENDING.append(self)

    @abstractmethod
    def copy(self):
        raise NotImplementedError()

    @abstractmethod
    def _instantiate(self):
        raise NotImplementedError()


def instantiate_pending() -> int:
    """Instantiate and drain every registered delayed node; returns
    how many ran."""
    n = 0
    while _PENDING:
        _PENDING.pop(0)._instantiate()
        n += 1
    return n
