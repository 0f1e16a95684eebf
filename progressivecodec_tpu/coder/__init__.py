from progressivecodec_tpu.coder.tables import CoderTables, merge_tables
from progressivecodec_tpu.coder import rans_numpy
from progressivecodec_tpu.coder import rans_device

__all__ = ["CoderTables", "merge_tables", "rans_numpy", "rans_device"]
