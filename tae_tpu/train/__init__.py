from tae_tpu.train.optim import adamw, step_lr, epoch_step_lr, no_decay_mask  # noqa: F401
from tae_tpu.train.step import make_eval_step, make_train_step, TrainState  # noqa: F401
