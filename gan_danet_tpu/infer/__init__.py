from gan_danet_tpu.infer.blend import smooth_blend  # noqa: F401
from gan_danet_tpu.infer.downscale import predict_025, predict_005  # noqa: F401
