from .finetune import OptParams, TrainState, opt_epoch, opt_init  # noqa: F401
