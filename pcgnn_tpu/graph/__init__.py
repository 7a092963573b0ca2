from pcgnn_tpu.graph.csr import RelGraph, MultiRelGraph, csr_from_edges, csr_from_scipy  # noqa: F401
