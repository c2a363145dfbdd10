from gan_danet_tpu.evaluation.metrics import (  # noqa: F401
    evaluate_metrics,
    mse,
    mae,
    rmse,
    r2_score,
    nse,
    pearson_r,
    corrcoef,
)
from gan_danet_tpu.evaluation.taylor import TaylorDiagram, taylor_stats  # noqa: F401
