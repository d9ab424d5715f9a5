"""csp.adapters.output_adapters parity package — the reference keeps
its parquet writer plus utility nodes here; our writer lives in
sinks/publish + adapters/parquet, the utility nodes in
parquet_utility_nodes."""

from .parquet_utility_nodes import flatten_numpy_array, reshape_numpy_array

__all__ = ["flatten_numpy_array", "reshape_numpy_array"]
