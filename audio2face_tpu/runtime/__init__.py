from audio2face_tpu.runtime.hostloader import (
    fragment_batch_i16,
    gather_rows_f32,
    native_available,
    Prefetcher,
)

__all__ = ["fragment_batch_i16", "gather_rows_f32", "native_available", "Prefetcher"]
