from audio2face_tpu.models.audio2mesh import Audio2Mesh
from audio2face_tpu.models.voca import Voca
from audio2face_tpu.models.song2face import Song2Face
from audio2face_tpu.models.faceformer import FaceFormer

__all__ = ["Audio2Mesh", "Voca", "Song2Face", "FaceFormer"]
