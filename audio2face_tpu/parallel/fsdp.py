"""FSDP / ZeRO-3: params + optimizer moments sharded over the data axis.

Plain data parallelism replicates every parameter and both Adam moments on
every chip — at wav2vec2-base scale that is ~1.1 GB of f32 state per chip
that never needed to be duplicated. FSDP shards each (large-enough)
parameter leaf and its mirrored optimizer moments across the mesh's
``data`` axis; under ``jax.jit`` GSPMD then inserts the classic ZeRO-3
collectives automatically: an all-gather of each weight right before its
use in the forward/backward, and a reduce-scatter of its gradient — no
hand-written communication, and the collectives ride ICI.

The reference has no distributed training at all (SURVEY §2.3), so there is
no counterpart to cite; the design follows the standard JAX recipe (pick a
mesh, annotate shardings on the state, let GSPMD do the rest).

Composition: the spec composes with Megatron tensor parallelism — a TP leaf
keeps its ``model``-axis dimension and FSDP claims a *different* dimension
for ``data``, e.g. the FFN intermediate kernel (768, 3072) becomes
``P('data', 'model')``. Leaves smaller than ``min_elems`` (biases, layer
norms) stay replicated: gathering them costs more latency than the bytes
saved.

Sharding is dimension-divisibility driven, not name driven, so the same
function places params, Adam ``mu``/``nu`` (whose tree paths mirror the
params), and any other state pytree.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from audio2face_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    wav2vec2_param_spec,
)

# below this many elements a leaf stays replicated: per-chip savings are
# bytes while every use still pays an all-gather dispatch
MIN_FSDP_ELEMS = 1 << 15


def fsdp_spec(shape, n_data: int, base: P = P(), min_elems: int = MIN_FSDP_ELEMS) -> P:
    """Insert ``DATA_AXIS`` into ``base`` on the best shardable dimension.

    Picks the largest dimension that (a) is not already taken by ``base``
    (e.g. a tensor-parallel ``model`` axis) and (b) divides evenly by
    ``n_data``. Returns ``base`` unchanged when the leaf is too small, no
    dimension qualifies, or the mesh has a single data shard.
    """
    size = 1
    for d in shape:
        size *= d
    if n_data <= 1 or size < min_elems:
        return base
    taken = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
    best = -1
    for i, d in enumerate(shape):
        if taken[i] is None and d % n_data == 0 and d > (shape[best] if best >= 0 else 0):
            best = i
    if best < 0:
        return base
    axes = list(taken)
    axes[best] = DATA_AXIS
    while axes and axes[-1] is None:
        axes.pop()
    return P(*axes)


def shard_state_fsdp(mesh, tree, tensor_parallel: bool = False,
                     min_elems: int = MIN_FSDP_ELEMS):
    """Place a training-state pytree with FSDP (optionally × TP) shardings.

    Every array leaf gets :func:`fsdp_spec`; when ``tensor_parallel`` is on,
    leaves under an ``audio_encoder`` subtree first get their Megatron spec
    (:func:`wav2vec2_param_spec`) and FSDP composes around it. Scalars and
    small leaves replicate. Works on params, full ``TrainState`` trees
    (optimizer moments mirror the param paths), and extractor param trees.
    """
    n_data = mesh.shape[DATA_AXIS]

    def put(path, leaf):
        import numpy as np

        shape = np.shape(leaf)
        base = P()
        if tensor_parallel:
            names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
            if any(str(n) == "audio_encoder" for n in names):
                base = wav2vec2_param_spec(path, leaf)
        spec = fsdp_spec(shape, n_data, base=base, min_elems=min_elems)
        try:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        except ValueError:  # a base (TP) dim doesn't divide the model axis
            return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, tree)


def state_memory_bytes(tree) -> int:
    """Total bytes of a state pytree (diagnostic for FSDP savings)."""
    import numpy as np

    return sum(
        int(np.prod(np.shape(x)) * np.dtype(getattr(x, "dtype", np.float32)).itemsize)
        for x in jax.tree.leaves(tree)
    )
