from .train import TrainState, make_train_step, init_train_state  # noqa: F401
