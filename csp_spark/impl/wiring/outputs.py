"""csp.impl.wiring.outputs parity (csp/impl/wiring/outputs.py).

Independent implementation of the frozen named-outputs record: the
reference file defines a ``__slots__`` dict-holder with hand-written
dunders; here the read surface funnels through one private lookup and
the storage lives under a name-mangled slot, with only the observable
contract shared — attribute OR item access by output name, item-set
(the engine populates outputs), iteration over names, ``len``,
attribute-freeze, underscore-prefixed dict helpers (so an output
actually *named* ``values``/``items``/``get`` stays reachable as an
attribute), and the ``OutputsContainer( k=v )`` repr format.
"""

from ...core.surface import OutputBasket, Outputs  # noqa: F401


class OutputsContainer:
    """Frozen record of a multi-output node/graph run, keyed by
    output name (contract: reference wiring/outputs.py:1-40)."""

    __slots__ = ("__outputs",)  # mangled -> _OutputsContainer__outputs

    def __init__(self, **outputs):
        object.__setattr__(self, "_OutputsContainer__outputs",
                           dict(outputs))

    # -- read surface: attribute and item access share one lookup ----
    def __lookup(self, name):
        return object.__getattribute__(
            self, "_OutputsContainer__outputs")[name]

    def __getattr__(self, name):
        try:
            return self.__lookup(name)
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name):
        return self.__lookup(name)

    # -- write surface: item-set only; attributes are frozen ---------
    def __setitem__(self, name, value):
        self.__outputs[name] = value

    def __setattr__(self, name, value):
        raise TypeError(
            "Cannot set attributes on OutputsContainer object"
        )

    # -- container protocol ------------------------------------------
    def __len__(self):
        return len(self.__outputs)

    def __iter__(self):
        return iter(self.__outputs)

    # -- pickle/copy: default paths route through the frozen
    # __setattr__ and raise; state travels as the plain dict ---------
    def __getstate__(self):
        return dict(self.__outputs)

    def __setstate__(self, state):
        object.__setattr__(self, "_OutputsContainer__outputs",
                           dict(state))

    # -- dict helpers, underscore-prefixed (see module docstring) ----
    def _values(self):
        return self.__outputs.values()

    def _items(self):
        return self.__outputs.items()

    def _get(self, name, dflt=None):
        return self.__outputs.get(name, dflt)

    def __repr__(self):
        inner = ",".join(
            f"{name}={value!r}" for name, value in self.__outputs.items()
        )
        return f"OutputsContainer( {inner} )"
