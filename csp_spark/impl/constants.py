"""csp.impl.constants parity (reference csp/impl/constants.py:1)."""


class _Unset:
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<UNSET>"

    def __bool__(self) -> bool:
        return False


UNSET = _Unset()


class _RemoveDynamicKey:
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<REMOVE_DYNAMIC_KEY>"


#: reference constants.py:2 — returning this from a dynamic-basket
#: node output removes the key (csp.remove_dynamic_key is the node-
#: body intrinsic form)
REMOVE_DYNAMIC_KEY = _RemoveDynamicKey()
