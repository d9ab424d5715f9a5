"""csp.adapters.output_adapters.parquet parity (reference
csp/adapters/output_adapters/parquet.py): the writer-side classes
under their defining-module path — the public csp.adapters.parquet
module re-exports them, and some reference code imports from here
directly."""

from ..parquet import ParquetOutputConfig, ParquetWriter  # noqa: F401


_ARRAY_DIMENSIONS_SUFFIX = "_csp_dimensions"


def resolve_array_shape_column_name(
    column_name: str, user_provided_shape_column: str | None = None
) -> str:
    """Reference parquet.py:16-24: the sidecar column that carries an
    array column's per-row shape (see parquet_utility_nodes)."""
    assert column_name
    return user_provided_shape_column or f"{column_name}{_ARRAY_DIMENSIONS_SUFFIX}"


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.output_adapters.parquet import K, V`
from typing import TypeVar as _TypeVar

K = _TypeVar("K")
V = _TypeVar("V")
