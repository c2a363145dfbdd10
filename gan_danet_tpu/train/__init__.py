from gan_danet_tpu.train.schedules import cosine_warm_restarts  # noqa: F401
from gan_danet_tpu.train.gan import GANTrainState, make_train_step, make_eval_step  # noqa: F401
from gan_danet_tpu.train.trainer import ModelTrainer  # noqa: F401
