"""csp.impl.constants parity (reference csp/impl/constants.py:1)."""


class _Unset:
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<UNSET>"

    def __bool__(self) -> bool:
        return False


UNSET = _Unset()
