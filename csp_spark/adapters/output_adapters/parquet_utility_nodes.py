"""csp.adapters.output_adapters.parquet_utility_nodes parity
(reference csp/adapters/output_adapters/parquet_utility_nodes.py:11-33):
``flatten_numpy_array`` / ``reshape_numpy_array`` bridge ND-array edges
and the ParquetWriter's flat-1D-array columns.

In the tick-table model an ND-array edge is a nested
``array<array<...>>`` column, so both directions are pure Catalyst
expressions (flatten / slice / transform) — whole-stage codegen, no
Python in the hot path. The one semantic delta vs the reference: its
``NumpyNDArray`` output is dynamically ranked, while a Spark column's
nesting depth is part of the static schema — so ``reshape_numpy_array``
takes the target rank as a static ``ndim`` argument (default 2)."""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ...core.ticks import KEY, SEQ, TS, VALUE, TickStream


def _array_depth(dt) -> int:
    d = 0
    while isinstance(dt, ArrayType):
        d += 1
        dt = dt.elementType
    return d


class _FlattenOutput(NamedTuple):
    # named-output parity with the reference node's csp.Outputs(value=,
    # shape=); tuple unpacking also works
    value: TickStream
    shape: TickStream


def flatten_numpy_array(x: TickStream) -> _FlattenOutput:
    """Flatten each ND-array tick to a 1-D array plus its shape
    (reference parquet_utility_nodes.py:11-19: ``x.reshape(-1)`` and
    ``numpy.array(x.shape)``).

    ``value`` is the row-major flattening (repeated ``F.flatten``),
    ``shape`` an ``array<long>`` of the original dimensions — both
    derived per tick from the same input row, so they tick
    synchronously as the reference guarantees."""
    depth = _array_depth(x.df.schema[x.value_col].dataType)
    if depth == 0:
        raise TypeError(
            "flatten_numpy_array expects an array-valued edge, got "
            f"{x.df.schema[x.value_col].dataType.simpleString()}"
        )
    v = F.col(x.value_col)
    dims, cur = [], v
    for _ in range(depth):
        dims.append(F.coalesce(F.size(cur), F.lit(0)).cast("long"))
        cur = cur.getItem(0)
    flat = v
    for _ in range(depth - 1):
        flat = F.flatten(flat)
    return _FlattenOutput(
        TickStream(x.df.select(KEY, TS, SEQ, flat.alias(VALUE))),
        TickStream(x.df.select(KEY, TS, SEQ, F.array(*dims).alias(VALUE))),
    )


def reshape_numpy_array(
    value: TickStream, shape: TickStream, ndim: int = 2
) -> TickStream:
    """Reshape flat 1-D array ticks back to rank-``ndim`` arrays using
    the synchronously-ticking ``shape`` stream (reference
    parquet_utility_nodes.py:22-33: ``value.reshape(shape)``; the
    reference likewise asserts both inputs ticked together, so
    alignment is an inner join on the engine cycle).

    Row-major: dimension ``i`` is rebuilt by slicing chunks of
    ``prod(shape[i+1:])`` elements — nested ``transform``/``slice``
    expressions, fully codegen."""
    if ndim < 1:
        raise ValueError("ndim must be >= 1")
    vdf = value.df.select(
        KEY, TS, SEQ, F.col(value.value_col).alias("__flat")
    )
    sdf = shape.df.select(
        KEY, TS, SEQ, F.col(shape.value_col).alias("__shape")
    )
    joined = vdf.join(sdf, [KEY, TS, SEQ], "inner")
    flat, shp = F.col("__flat"), F.col("__shape")

    def chunk(i):
        # elements per entry of dimension i = prod(shape[i+1:])
        return F.aggregate(
            F.slice(shp, i + 2, ndim - i - 1),
            F.lit(1).cast("long"),
            lambda acc, y: acc * y.cast("long"),
        )

    def build(i, offset):
        # sub-array of rank (ndim - i) starting at 0-based `offset`
        n = shp.getItem(i).cast("long")
        if i == ndim - 1:
            return F.slice(flat, (offset + 1).cast("int"), n.cast("int"))
        c = chunk(i)
        idx = F.filter(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(n, F.lit(1).cast("long")) - 1,
            ),
            lambda j: j < n,
        )
        return F.transform(idx, lambda j: build(i + 1, offset + j * c))

    out = build(0, F.lit(0).cast("long"))
    return TickStream(joined.select(KEY, TS, SEQ, out.alias(VALUE)))


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.output_adapters.parquet_utility_nodes import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
