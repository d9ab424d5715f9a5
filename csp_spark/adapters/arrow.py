"""csp.adapters.arrow parity (reference csp/adapters/arrow.py):
RecordBatch replay in, record-batch collection out."""
from ..sources.other import from_arrow
from ..sinks.publish import write_record_batches

__all__ = ["from_arrow", "write_record_batches"]
