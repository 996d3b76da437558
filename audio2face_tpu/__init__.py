"""audio2face_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-to-3D-face framework.

Re-designed from scratch with the capabilities of xtliu97/audio2face-pytorch
(reference mounted read-only at /root/reference): three model families
(Audio2Mesh, VOCA, FaceFormer) plus the experimental Song2Face, a fused JAX
audio DSP front-end (MFCC / wav2vec2), VOCASET data pipeline, position+velocity
losses, a jit'd training loop with pjit data/tensor parallelism, orbax
checkpoints, and a software renderer producing FLAME mesh animations.

Public surface mirrors the reference (config.yaml keys incl. the `percision`
spelling, `{audio, one_hot, template} -> (B, T, 5023, 3)` model contract,
12-subject VOCASET split) while the implementation is TPU-first.
"""

__version__ = "0.3.0"  # kept in sync with pyproject.toml

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.registry import get_model, get_extractor, get_loss_fn

__all__ = ["ExpConfig", "get_model", "get_extractor", "get_loss_fn", "__version__"]


def __getattr__(name):
    # lazy: streaming/serving pull in the full model stack
    if name == "StreamingFaceFormerPredictor":
        from audio2face_tpu.streaming import StreamingFaceFormerPredictor

        return StreamingFaceFormerPredictor
    if name in ("MultiStreamFaceFormerPredictor", "StreamingServer"):
        from audio2face_tpu import multistream

        return getattr(multistream, name)
    if name in ("FaceFormerPredictor", "FramePredictor"):
        from audio2face_tpu import serving

        return getattr(serving, name)
    if name == "FrameStreamPool":
        from audio2face_tpu.frame_stream import FrameStreamPool

        return FrameStreamPool
    if name == "BatchingServer":
        from audio2face_tpu.serving_queue import BatchingServer

        return BatchingServer
    if name == "ServingDaemon":
        from audio2face_tpu.http_server import ServingDaemon

        return ServingDaemon
    if name in ("LiveStreamingDaemon", "LiveClient"):
        from audio2face_tpu import live_server

        return getattr(live_server, name)
    if name in ("VertexRegions", "evaluate_animation", "infer_regions"):
        from audio2face_tpu import evaluation

        return getattr(evaluation, name)
    if name == "BiwiDataModule":
        from audio2face_tpu.data.biwi import BiwiDataModule

        return BiwiDataModule
    raise AttributeError(name)
