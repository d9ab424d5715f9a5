from . import baselib, math_ops
