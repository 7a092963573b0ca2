"""pcgnn_tpu — a TPU-native (JAX/XLA/Pallas) GNN framework for imbalanced fraud
detection, providing the full capability surface of the PC-GNN reference
implementation (h22hyeon/PC-GNN): Pick-Choose-Aggregate layers over
multi-relation graphs, GraphSAGE/GCN baselines, label-balanced sampling,
distance-driven neighbor filtering, a trainer with validation-gain model
selection, metrics/result management, and SPMD scaling over device meshes.

Design stance (vs. the reference, see SURVEY.md):
  * dict-of-sets adjacency     -> static padded CSR (``graph.csr.RelGraph``)
  * Python loops over batches  -> one jitted ``lax.scan`` per epoch
  * per-node torch.sort choose -> vectorized double-argsort rank + mask
  * dense [B,U] host masks     -> device scatter into [B,N] + MXU GEMM
  * no distribution            -> ``parallel``: DP + graph-sharded halo exchange
"""

__version__ = "0.1.0"

from pcgnn_tpu.graph.csr import RelGraph, MultiRelGraph  # noqa: F401
