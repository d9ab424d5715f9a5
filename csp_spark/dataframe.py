"""``csp.dataframe`` import-path parity (reference csp/dataframe.py):
the frame-of-edges DataFrame lives in csp_spark.frame; this module
mirrors the reference's import location."""

from .frame import TsFrame as DataFrame  # noqa: F401
