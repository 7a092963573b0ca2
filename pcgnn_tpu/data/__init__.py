from pcgnn_tpu.data.loaders import load_data  # noqa: F401
from pcgnn_tpu.data.synthetic import synthetic_fraud_graph  # noqa: F401
from pcgnn_tpu.data.prep import (  # noqa: F401
    normalize_features,
    pos_neg_split,
    stratified_splits,
)
