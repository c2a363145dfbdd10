from gan_danet_tpu.core.config import (  # noqa: F401
    DataConfig,
    GeneratorConfig,
    DiscriminatorConfig,
    LossConfig,
    TrainConfig,
    MeshConfig,
    ExperimentConfig,
)
from gan_danet_tpu.core.meshes import make_mesh, batch_sharding, replicated  # noqa: F401
