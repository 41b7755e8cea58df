from .trainer import ModelTrainer, TrainConfig  # noqa: F401
from .cross_val import cross_val_training  # noqa: F401
