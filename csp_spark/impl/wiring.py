"""csp.impl.wiring parity (csp/impl/wiring/__init__.py): the adapter
factory builders under their reference import path."""

from ..sinks.publish import py_output_adapter_def  # noqa: F401
from ..sources.other import py_pull_adapter_def  # noqa: F401
from .adaptermanager import py_managed_adapter_def  # noqa: F401
from .pushadapter import py_push_adapter_def  # noqa: F401
from .pushpulladapter import py_pushpull_adapter_def  # noqa: F401

__all__ = [
    "py_pull_adapter_def",
    "py_output_adapter_def",
    "py_managed_adapter_def",
    "py_push_adapter_def",
    "py_pushpull_adapter_def",
]
