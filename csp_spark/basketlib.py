"""``csp.basketlib`` import-path parity (reference csp/basketlib.py)."""

from .operators.basketlib import (  # noqa: F401
    sample_basket,
    sample_dict,
    sample_list,
    sync,
    sync_dict,
    sync_list,
)


def sync_list_internal(x, trigger, threshold, output_incomplete, use_trigger):
    """Reference csp/basketlib.py:15-39 — the explicit-arg node behind
    sync_list; kept callable for parity with code that reaches past
    the public wrapper."""
    return sync_list(
        x, threshold, output_incomplete, trigger if use_trigger else None
    )


import typing as _typing

K = _typing.TypeVar("K")
Y = _typing.TypeVar("Y")


# reference-parity module-scope TypeVars: ported programs do
# `from csp.basketlib import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
