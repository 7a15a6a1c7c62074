from audio_cut_tpu.training.trainer import TrainConfig, Trainer, make_train_step

__all__ = ["Trainer", "TrainConfig", "make_train_step"]
