"""csp.adapters.arrow parity (reference csp/adapters/arrow.py):
RecordBatch replay in (plain batches or PyCapsule C Data interface),
typed-Struct conversion both ways, record-batch collection out."""
from ..sinks.publish import struct_to_record_batches, write_record_batches
from ..sources.other import from_arrow, record_batch_pull, record_batches_to_struct

# both reference adapters (Python and C-Data) resolve to the one pull
# path here — record_batch_pull accepts RecordBatches AND capsule tuples
RecordBatchPullInputAdapter = record_batch_pull
CRecordBatchPullInputAdapter = record_batch_pull

__all__ = [
    "CRecordBatchPullInputAdapter",
    "RecordBatchPullInputAdapter",
    "from_arrow",
    "record_batch_pull",
    "record_batches_to_struct",
    "struct_to_record_batches",
    "write_record_batches",
]


# reference-parity module-scope TypeVars: ported programs do
# `from csp.adapters.arrow import T`
from typing import TypeVar as _TypeVar

T = _TypeVar("T")
