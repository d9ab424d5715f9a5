"""``csp.baselib`` import-path parity (reference csp/baselib.py).

Reference users import operators from the submodule path
(``from csp.baselib import merge``, ``csp.baselib.filter(...)`` —
e.g. csp/dataframe.py:26 does exactly that), and the alias finder
maps ``csp.X`` onto ``csp_spark.X`` — so this module re-exports the
package-level operator surface under the reference's module name.
Every object is the SAME object as the top-level export (one set of
classes/functions, no re-implementation).
"""

from . import (  # noqa: F401
    DelayedCollect,
    const,
    curve,
    DelayedDemultiplex,
    LogSettings,
    accum,
    apply,
    cast_int_to_float,
    collect,
    count,
    default,
    delay,
    demultiplex,
    diff,
    drop_dups,
    drop_nans,
    dynamic_cast,
    dynamic_collect,
    dynamic_demultiplex,
    exprtk,
    filter,
    firstN,
    flatten,
    gate,
    get_basket_field,
    log,
    merge,
    multiplex,
    null_ts,
    print,
    sample,
    schedule_on_engine_stop,
    split,
    static_cast,
    stop_engine,
    struct_collectts,
    struct_field,
    struct_fromts,
    timer,
    times,
    times_ns,
    unroll,
    wrap_feedback,
)


import typing as _typing

K = _typing.TypeVar("K")
V = _typing.TypeVar("V")
Y = _typing.TypeVar("Y")
U = _typing.TypeVar("U")


# reference-parity module-scope TypeVars: ported programs do
# `from csp.baselib import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
