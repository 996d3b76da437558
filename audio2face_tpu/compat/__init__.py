from audio2face_tpu.compat.torch_convert import (
    convert_audio2mesh,
    convert_voca,
    convert_song2face,
    convert_state_dict,
)

__all__ = [
    "convert_audio2mesh",
    "convert_voca",
    "convert_song2face",
    "convert_state_dict",
]
