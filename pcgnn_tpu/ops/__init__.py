from pcgnn_tpu.ops.aggregate import (  # noqa: F401
    batch_neighbor_window,
    choose_keep_mask,
    oversample_keep,
    masked_mean_aggregate,
    scatter_batch_mask,
    segment_mean_spmm,
)
from pcgnn_tpu.ops.sddmm import edge_abs_diff  # noqa: F401
