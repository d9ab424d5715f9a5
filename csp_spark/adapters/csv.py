"""csp.adapters.csv parity (reference csp/adapters/csv.py)."""
from ..sources.other import read_csv
from ..sinks.publish import publish_csv

__all__ = ["read_csv", "publish_csv"]
