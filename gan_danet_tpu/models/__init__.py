from gan_danet_tpu.models.generator import (  # noqa: F401
    FlexibleUpsamplingModule,
    OriginalRelationshipLearner,
)
from gan_danet_tpu.models.attention import (  # noqa: F401
    PAMModule,
    CAMModule,
    DANetAttention,
    SqueezeExcitation,
    CBAMBlock,
)
from gan_danet_tpu.models.discriminator import Discriminator1, SRGAND  # noqa: F401
from gan_danet_tpu.models.initializers import kaiming_conv_init, xavier_linear_init  # noqa: F401
