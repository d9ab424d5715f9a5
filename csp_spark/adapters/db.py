"""csp.adapters.db parity (reference csp/adapters/db.py DBReader):
Spark JDBC source with predicate pushdown + partitioned reads."""
from ..sources.other import read_jdbc

__all__ = ["read_jdbc"]
