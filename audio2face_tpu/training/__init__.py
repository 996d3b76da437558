from audio2face_tpu.training.trainer import Audio2FaceExperiment, TrainState

__all__ = ["Audio2FaceExperiment", "TrainState"]
