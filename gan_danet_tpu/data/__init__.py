from gan_danet_tpu.data.cache import cache_exists, load_cache, save_cache  # noqa: F401
from gan_danet_tpu.data.dataset import ArrayDataset, Batcher  # noqa: F401
from gan_danet_tpu.data.pipeline import load_data, load_data_with_augmentation  # noqa: F401
from gan_danet_tpu.data.synthetic import make_synthetic_raw  # noqa: F401
