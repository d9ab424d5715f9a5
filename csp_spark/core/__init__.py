from .session import get_spark
from .ticks import TickStream, KEY, TS, SEQ, VALUE, GLOBAL_KEY
from .align import align, align_wide, sample, binary_op, asof_join
