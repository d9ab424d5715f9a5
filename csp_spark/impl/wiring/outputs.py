"""csp.impl.wiring.outputs parity (csp/impl/wiring/outputs.py)."""

from ...core.surface import OutputBasket, Outputs  # noqa: F401


class OutputsContainer:
    """reference wiring/outputs.py:1-40 contract: the named-outputs
    record a multi-output node/graph returns — attribute OR item
    access by output name, iterable over names, attribute-frozen
    (outputs are assigned via item syntax only). Public helpers are
    underscore-prefixed so they can't clash with an output named
    ``values``/``items``/``get``."""

    __slots__ = ("_dict",)

    def __init__(self, **kwargs):
        object.__setattr__(self, "_dict", dict(kwargs))

    def __getattr__(self, item):
        try:
            return self._dict[item]
        except KeyError:
            raise AttributeError(item) from None

    def __getitem__(self, item):
        return self._dict[item]

    def __setattr__(self, key, value):
        raise TypeError("Cannot set attributes on OutputsContainer object")

    def __setitem__(self, key, value):
        self._dict[key] = value

    def __len__(self):
        return len(self._dict)

    def __iter__(self):
        return iter(self._dict)

    def _values(self):
        return self._dict.values()

    def _items(self):
        return self._dict.items()

    def _get(self, item, dflt=None):
        return self._dict.get(item, dflt)

    def __repr__(self):
        body = ",".join(f"{k}={v!r}" for k, v in self._items())
        return f"OutputsContainer( {body} )"
