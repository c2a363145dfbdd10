"""Model zoo public surface (reference models/__init__.py:12-23 re-exports
FlexibleUpsamplingModule, Discriminator1, SRGAND, PerceptualLoss, SSIM,
TVLoss, weights_init_normal; the notebook-local models are first-class
citizens here)."""
from gan_danet_tpu.models.generator import (  # noqa: F401
    DenseBlock,
    DenseLayer,
    FlexibleUpsamplingModule,
    OriginalRelationshipLearner,
    TransitionLayer,
)
from gan_danet_tpu.models.attention import (  # noqa: F401
    CAMModule,
    CBAMBlock,
    DANetAttention,
    PAMModule,
    SqueezeExcitation,
    build_attention,
)
from gan_danet_tpu.models.discriminator import Discriminator1, SRGAND  # noqa: F401
from gan_danet_tpu.models.losses import (  # noqa: F401
    GeneratorLoss,
    bce_with_logits,
    discriminator_loss,
    make_perceptual_loss,
    mae,
    mse,
)
from gan_danet_tpu.models.initializers import (  # noqa: F401
    kaiming_conv_init,
    xavier_linear_init,
)
from gan_danet_tpu.models.ae import Autoencoder, AETrainer  # noqa: F401
from gan_danet_tpu.models.hat import HAT  # noqa: F401
from gan_danet_tpu.models.scale_invariant import ScaleInvariantNetwork  # noqa: F401
