from . import alarms, baselib, math_ops
from . import basketlib
from . import history
