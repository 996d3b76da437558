from audio2face_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    wav2vec2_param_spec,
    shard_params_tensor_parallel,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "wav2vec2_param_spec",
    "shard_params_tensor_parallel",
]
