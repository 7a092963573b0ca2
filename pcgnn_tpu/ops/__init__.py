from pcgnn_tpu.ops.aggregate import (  # noqa: F401
    batch_neighbor_window,
    choose_keep_mask,
    dedup_minor_keep,
    masked_mean_aggregate,
    oversample_candidates,
    oversample_keep,
    row_ranks,
    scatter_batch_mask,
    segment_mean_spmm,
    union_self_window,
    window_mean_aggregate,
)
from pcgnn_tpu.ops.sddmm import edge_abs_diff, edge_ranks_global  # noqa: F401
