from gan_danet_tpu.ops.resize import resize2d, resize_matrix  # noqa: F401
from gan_danet_tpu.ops.attention import (  # noqa: F401
    pam_attention,
    cam_attention,
)
from gan_danet_tpu.ops.ssim import ssim  # noqa: F401
from gan_danet_tpu.ops.tv import tv_loss  # noqa: F401
from gan_danet_tpu.ops.gaussian import gaussian_filter2d, gaussian_matrix  # noqa: F401
from gan_danet_tpu.ops.histmatch import histogram_match, mild_histogram_match  # noqa: F401
