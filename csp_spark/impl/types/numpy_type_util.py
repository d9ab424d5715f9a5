"""csp.impl.types.numpy_type_util parity (reference
csp/impl/types/numpy_type_util.py:1-9)."""

import numpy


def map_numpy_dtype_to_python_type(numpy_dtype):
    if numpy.issubdtype(numpy_dtype, numpy.str_):
        return str
    if numpy.issubdtype(numpy_dtype, numpy.bool_):
        return bool
    if numpy.issubdtype(numpy_dtype, numpy.integer):
        return int
    if numpy.issubdtype(numpy_dtype, numpy.floating):
        return float
    return object
