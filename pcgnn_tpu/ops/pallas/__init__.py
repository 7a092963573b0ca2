from pcgnn_tpu.ops.pallas.mask_build import build_batch_mask  # noqa: F401
