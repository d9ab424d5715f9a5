"""csp.impl.pandas parity (reference csp/impl/pandas.py make_pandas):
the ts-of-frames builder under its reference import path. The batch
form returns the LONG Spark frame of per-trigger windowed buffers
(TsFrame.to_spark_ts — one row per (trigger, buffer cycle), NULL where
a column did not tick); use TsFrame.to_pandas_ts for the pandas
Series-of-DataFrames convenience."""

from __future__ import annotations

from ..frame import TsFrame

__all__ = ["make_pandas"]


def make_pandas(trigger, data, window, tindex=None, wait_all_valid=True):
    return TsFrame(dict(data)).to_spark_ts(
        trigger, window, tindex=tindex, wait_all_valid=wait_all_valid
    )
