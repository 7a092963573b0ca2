from pcgnn_tpu.train.trainer import Trainer  # noqa: F401
from pcgnn_tpu.train.metrics import evaluate, get_best_f1, conf_gmean, prob2pred  # noqa: F401
from pcgnn_tpu.train.results import ResultManager  # noqa: F401
from pcgnn_tpu.train.legacy_log import LegacyLog  # noqa: F401
