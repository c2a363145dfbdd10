from gan_danet_tpu.infer.blend import smooth_blend  # noqa: F401
from gan_danet_tpu.infer.downscale import (  # noqa: F401
    make_apply_fn,
    predict_005,
    predict_025,
)
