"""csp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Point72/csp (reference read-only at
/root/reference), re-expressed Spark-first (SURVEY.md).

Core representation: the tick table (key, ts, seq, value); core kernel:
the align/as-of last-value join (csp_spark.core.align). Batch mode =
DataFrames over parquet (csp simulation); realtime = Structured
Streaming over the same logical ops (csp realtime).
"""

from .core.session import get_spark
from .core.ticks import TickStream, KEY, TS, SEQ, VALUE, GLOBAL_KEY
from .core.align import align, align_wide, sample, binary_op, asof_join
from .core.enum import DynamicEnum, Enum
from .core.profiler import Profiler
from .core.record import Struct, UNSET
from .frame import TsFrame
from .plans.runtime import csp_memoized, memoize, run_on_thread, show_graph

__version__ = "0.1.0"
__all__ = [
    "get_spark", "TickStream", "align", "align_wide", "sample",
    "binary_op", "asof_join", "KEY", "TS", "SEQ", "VALUE", "GLOBAL_KEY",
    "Profiler", "Struct", "UNSET", "TsFrame", "Enum", "DynamicEnum",
    "run_on_thread", "memoize", "csp_memoized", "show_graph",
]
