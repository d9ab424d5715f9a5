"""Reference-signature compatibility for the top-level namespace.

The reference wires sources with the ENGINE holding the ambient
context: ``csp.const(1.0)``, ``csp.curve(float, [...])``,
``csp.print(tag, x)`` (csp/baselib.py:73, csp/curve.py:16,
csp/baselib.py print). csp_spark's native forms are explicit —
``const(spark, value, start)`` — because batch wiring has no implicit
engine. These wrappers accept BOTH: when the first argument is a
SparkSession the native form is used unchanged; otherwise the
reference form resolves the session from the active one
(get_spark) and the start time from the enclosing csp.run() (the
engine-services stack, plans/runtime.py). Reference examples then run
verbatim; existing csp_spark code is untouched.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import SparkSession

from ..operators import baselib as _bl
from ..sinks.publish import print_ticks as _print_ticks
from .record import Struct
from .ticks import GLOBAL_KEY, TickStream

__all__ = ["const", "curve", "print_ticks"]

_DDL = {
    float: "double", int: "long", bool: "boolean", str: "string",
    _dt.datetime: "timestamp",
}


def _type_ddl(typ: Any) -> str:
    import numpy as _np

    from ..typing import NumpyNDArray

    if isinstance(typ, str):
        return typ
    if isinstance(typ, type) and issubclass(typ, Struct):
        return typ.spark_type().simpleString()
    if isinstance(typ, type) and issubclass(typ, (_np.ndarray, NumpyNDArray)):
        # ndarray edges ride as array<double> (SURVEY §1.3: Spark
        # parallelizes over keys what csp vectorizes over arrays)
        return "array<double>"
    try:
        return _DDL[typ]
    except KeyError:
        raise TypeError(f"unsupported csp.curve/const element type {typ!r}")


def _coerce(v: Any) -> Any:
    import numpy as _np

    if isinstance(v, Struct):
        return v.to_dict()
    if isinstance(v, _np.ndarray):
        # N-d arrays nest (e.g. a covariance matrix constant); numeric
        # dtypes cast to float so the array<double> DDL accepts them
        # (int/bool elements would fail the schema verifier)
        if v.dtype.kind in "biuf":
            return v.astype(float).tolist()
        return v.tolist()
    return v


def _ambient_spark() -> SparkSession:
    from .session import get_spark

    return get_spark()


def const(*args: Any, **kwargs: Any) -> TickStream:
    """csp.const — reference form ``const(value, delay=None)`` (start =
    the enclosing csp.run's starttime) or the explicit csp_spark form
    ``const(spark, value, start, ...)``."""
    if args and isinstance(args[0], SparkSession):
        return _bl.const(*args, **kwargs)
    from ..plans.runtime import engine_start_time

    value = args[0] if args else kwargs.pop("value")
    delay = args[1] if len(args) > 1 else kwargs.pop("delay", None)
    start = kwargs.pop("start", None)
    if start is None:
        try:
            start = engine_start_time()
        except RuntimeError:
            start = None
    if start is None:
        raise ValueError(
            "csp.const(value) needs an engine start time — call it "
            "inside csp.run(..., starttime=...) or pass start="
        )
    vt = kwargs.pop("value_type", None)
    if vt is None:
        import numpy as _np

        if isinstance(value, _np.ndarray) and value.ndim > 1:
            # N-d constants (e.g. a covariance matrix) nest the DDL
            vt = "array<" * value.ndim + "double" + ">" * value.ndim
        else:
            vt = _type_ddl(type(value))
    return _bl.const(
        _ambient_spark(), _coerce(value), start, delay=delay,
        value_type=vt, **kwargs,
    )


def curve(*args: Any, **kwargs: Any) -> TickStream:
    """csp.curve — reference form ``curve(typ, data)`` (csp/curve.py:16)
    or the explicit csp_spark form ``curve(spark, data, value_type)``."""
    if args and isinstance(args[0], SparkSession):
        return _bl.curve(*args, **kwargs)
    typ = args[0] if args else kwargs.pop("typ")
    data = args[1] if len(args) > 1 else kwargs.pop("data")
    if typ is object:
        # object edges (reference ts[object]): let Spark infer the
        # value type from the data (dicts → map, lists → array, ...)
        return _curve_infer(data, kwargs)
    vt = _type_ddl(typ)
    if isinstance(data, list):
        # reference type normalization: curve(float, [... 3 ...]) is
        # legal csp — coerce scalars onto the declared element type
        conv = typ if typ in (float, int, bool, str) else _coerce
        data = [(t, conv(v)) for t, v in data]
    if "start" not in kwargs:
        from ..plans.runtime import engine_start_time

        try:
            kwargs["start"] = engine_start_time()
        except RuntimeError:
            pass
    return _bl.curve(
        _ambient_spark(), data, value_type=vt,
        key=kwargs.pop("key", GLOBAL_KEY), **kwargs,
    )


def null_ts(*args: Any, **kwargs: Any) -> TickStream:
    """csp.null_ts — reference form ``null_ts(typ)`` (baselib.py:544:
    a never-ticking edge of the given type) or the explicit csp_spark
    form ``null_ts(spark, value_type)``."""
    if args and isinstance(args[0], SparkSession):
        return _bl.null_ts(*args, **kwargs)
    typ = args[0] if args else kwargs.pop("typ", float)
    vt = typ if isinstance(typ, str) else _type_ddl(typ)
    return _bl.null_ts(_ambient_spark(), vt)


def timer(*args: Any, **kwargs: Any) -> TickStream:
    """csp.timer — reference form ``timer(interval, value=True)``
    (start/end from the enclosing csp.run; csp/baselib.py:74) or the
    explicit csp_spark form ``timer(spark, start, end, interval, ...)``."""
    if args and isinstance(args[0], SparkSession):
        return _bl.timer(*args, **kwargs)
    from ..plans.runtime import engine_end_time, engine_start_time

    interval = args[0] if args else kwargs.pop("interval")
    value = args[1] if len(args) > 1 else kwargs.pop("value", True)
    try:
        start, end = engine_start_time(), engine_end_time()
    except RuntimeError:
        start = end = None
    if start is None or end is None:
        raise ValueError(
            "csp.timer(interval) needs a bounded engine run — call it "
            "inside csp.run(starttime=..., endtime=...)"
        )
    vt = kwargs.pop("value_type", None) or (
        "boolean" if isinstance(value, bool) else _type_ddl(type(value))
    )
    return _bl.timer(
        _ambient_spark(), start, end, interval,
        value=_coerce(value), value_type=vt, **kwargs,
    )


def exprtk(*args: Any, **kwargs: Any) -> TickStream:
    """csp.exprtk — reference argument order ``exprtk(expression,
    inputs, state_vars?, trigger=, functions=, constants=,
    output_ndarray=)`` (csp/baselib.py:625-673), or the DataFrame
    helper form ``exprtk(aligned_df, expr_str)``."""
    from pyspark.sql import DataFrame as _SDF

    from ..operators.baselib import exprtk as _df_exprtk
    from ..operators.exprtk import exprtk_ts

    if args and isinstance(args[0], _SDF):
        return _df_exprtk(*args, **kwargs)
    expression = args[0] if args else kwargs.pop("expression_str")
    inputs = args[1] if len(args) > 1 else kwargs.pop("inputs")
    state_vars = args[2] if len(args) > 2 else kwargs.pop("state_vars", None)
    return exprtk_ts(inputs, expression, state_vars=state_vars, **kwargs)


def _curve_infer(data, kwargs) -> TickStream:
    """curve(typ=object): schema inferred by Spark from the values."""
    import datetime as _dtm

    from ..core.ticks import GLOBAL_KEY, TickStream

    start = kwargs.pop("start", None)
    if start is None:
        from ..plans.runtime import engine_start_time

        try:
            start = engine_start_time()
        except RuntimeError:
            start = None
    rows = []
    for i, (t, v) in enumerate(list(data)):
        if isinstance(t, _dt.timedelta):
            if start is None:
                raise ValueError(
                    "timedelta-based curve data needs an engine start"
                )
            t = start + t
        rows.append((kwargs.get("key", GLOBAL_KEY), t, i, _coerce(v)))
    spark = _ambient_spark()
    df = spark.createDataFrame(rows, ["key", "ts", "seq", "value"])
    df = df.withColumn("ts", df["ts"].cast("timestamp")).withColumn(
        "seq", df["seq"].cast("long")
    )
    # driver-born literal rows stay readable for const-parameter folds
    # (csp.random drift/covariance via object-typed curves), same
    # contract as TickStream.from_rows
    from ..core.ticks import LOCAL_ROWS_CAP, LOCAL_ROWS_OVER_CAP

    return TickStream(
        df,
        local_rows=(
            tuple(rows) if len(rows) <= LOCAL_ROWS_CAP
            else LOCAL_ROWS_OVER_CAP
        ),
    )


def print_ticks(a: Any, b: Any = None, **kwargs: Any) -> None:
    """csp.print — reference argument order ``print(tag, x)`` or the
    csp_spark order ``print_ticks(x, tag=...)``. A dict of streams
    (list/dict basket) prints each member under ``tag[key]``."""
    if isinstance(a, str) and b is not None:
        if isinstance(b, dict):
            for k, v in b.items():
                _print_ticks(v, tag=f"{a}[{k}]", **kwargs)
            return None
        return _print_ticks(b, tag=a, **kwargs)
    if b is not None:
        return _print_ticks(a, tag=b, **kwargs)
    return _print_ticks(a, **kwargs)
