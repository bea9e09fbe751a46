from controllora_tpu.training.trainer import ControlLoRATrainer, TrainState  # noqa: F401
