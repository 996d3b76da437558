from audio2face_tpu.ops import dsp
from audio2face_tpu.ops.attention import flash_attention, decode_step_attention

__all__ = ["dsp", "flash_attention", "decode_step_attention"]
