from pcgnn_tpu.sampling.pick import pick_probs, pick_step  # noqa: F401
