from pcgnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from pcgnn_tpu.parallel.spmd import (  # noqa: F401
    make_spmd_train_step,
    pad_graph_for_mesh,
    spmd_loss_fn,
)
