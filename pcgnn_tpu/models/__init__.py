from pcgnn_tpu.models.pcgnn import PCGNN  # noqa: F401
from pcgnn_tpu.models.gcn import GCN  # noqa: F401
from pcgnn_tpu.models.graphsage import GraphSage  # noqa: F401


def build_model(name: str, **kwargs):
    """Model registry, mirroring the reference's model switch
    (``src/model_handler.py:96-120``)."""
    name = name.upper()
    if name == "PCGNN":
        return PCGNN(**kwargs)
    if name == "GCN":
        return GCN(**kwargs)
    if name == "SAGE":
        return GraphSage(**kwargs)
    raise ValueError(f"unknown model {name!r} (expected PCGNN, GCN, or SAGE)")
