from audio2face_tpu.utils.facemesh import FaceMesh

__all__ = ["FaceMesh"]
