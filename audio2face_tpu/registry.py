"""Model / feature-extractor / loss registries.

Mirrors the reference's string->class maps
(src/model/lightning_model.py:50-73) with two fixes called out in SURVEY §2
#4: no phantom ``af_model`` entry (the reference registers a class whose
module does not exist — a latent ImportError), and ``None`` maps to no
extractor for raw-audio models (faceformer).

Imports are lazy so importing the package does not pull every model (and so
light-weight consumers — e.g. the renderer CLI — avoid compiling model code).
"""

from __future__ import annotations

from typing import Callable, Optional

from audio2face_tpu.losses import FaceFormerLoss, VocaLoss


def get_model(modelname: str):
    """Return the model class for ``modelname``.

    All models share the uniform constructor ``Model(n_verts, n_onehot)`` and
    apply signature ``model.apply(params, x, one_hot, template) -> verts``
    (reference contract: src/model/audio2face.py:8,57 · voca.py:6,38 ·
    song2face.py:8,59 · faceformer.py:92,139).
    """
    if modelname == "voca":
        from audio2face_tpu.models.voca import Voca

        return Voca
    if modelname == "audio2mesh":
        from audio2face_tpu.models.audio2mesh import Audio2Mesh

        return Audio2Mesh
    if modelname == "song2face":
        from audio2face_tpu.models.song2face import Song2Face

        return Song2Face
    if modelname == "faceformer":
        from audio2face_tpu.models.faceformer import FaceFormer

        return FaceFormer
    raise KeyError(
        f"Unknown model {modelname!r}; available: voca, audio2mesh, song2face, faceformer"
    )


def get_extractor(extractor: Optional[str]) -> Callable:
    """Return the feature-extractor factory (reference:
    src/model/lightning_model.py:62-69). ``None`` -> no-op factory returning
    ``None`` so raw audio flows straight to the model."""
    if extractor is None:
        return lambda *args, **kwargs: None
    if extractor == "mfcc":
        from audio2face_tpu.models.extractor import MFCCExtractor

        return MFCCExtractor
    if extractor == "wav2vec":
        from audio2face_tpu.models.extractor import Wav2VecExtractor

        return Wav2VecExtractor
    raise KeyError(f"Unknown extractor {extractor!r}; available: mfcc, wav2vec, None")


def get_loss_fn(modelname: str):
    """Loss selection by model family (reference:
    src/model/lightning_model.py:71-73)."""
    if modelname == "faceformer":
        return FaceFormerLoss()
    return VocaLoss()
