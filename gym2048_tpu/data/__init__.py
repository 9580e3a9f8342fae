from gym2048_tpu.data.training_data import TrainingData, training_data  # noqa: F401
