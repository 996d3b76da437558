"""Device mesh + sharding rules (pjit/GSPMD data & tensor parallelism).

The reference has no distributed support at all (SURVEY §2.3: single-process
Lightning, no torch.distributed). Here scaling is native:

- a 2-D ``(data, model)`` mesh over ICI;
- batches sharded on ``data`` (the primary axis — VOCASET batches are large
  and independent);
- wav2vec2's attention heads and FFN sharded on ``model`` (Megatron-style
  tensor parallelism: qkv/intermediate column-split, out/output row-split),
  everything else replicated;
- gradients reduce via the ``psum``s GSPMD inserts under ``jax.jit`` with
  these shardings — no hand-written collectives needed at this model scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: tuple[int, int] = (-1, 1), devices: Optional[list] = None
) -> Mesh:
    """Create a (data, model) mesh. ``-1`` absorbs the remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    d, m = shape
    if d == -1 and m == -1:
        raise ValueError("at most one mesh axis may be -1")
    if d == -1:
        d = n // m
    if m == -1:
        m = n // d
    if d * m != n:
        raise ValueError(f"mesh shape {(d, m)} does not cover {n} devices")
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Put a host batch onto the mesh, sharded along the batch axis.

    Per-item arrays shard on ``data``; scalars replicate.
    """
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_data != 0:
            # odd-sized tails (e.g. the last val batch) replicate
            return jax.device_put(x, NamedSharding(mesh, P()))
        # no-op if already placed with this sharding
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))

    return jax.tree.map(put, batch)


def shard_map_data(mesh: Mesh, fn, in_specs, out_specs):
    """``shard_map`` a batch-parallel fn over the mesh with replication
    checking off (the kwarg is named ``check_rep`` or ``check_vma``
    depending on the jax version; Pallas-calling bodies need it off).

    Each device runs the FULL ``fn`` (including Pallas kernels, which
    GSPMD cannot partition on its own) on its local slice of every
    ``P(DATA_AXIS)`` input; ``fn`` must therefore derive batch sizes from
    input shapes, never from closure constants.
    """
    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    params = inspect.signature(shard_map).parameters
    kw = (
        {"check_rep": False} if "check_rep" in params
        else {"check_vma": False} if "check_vma" in params
        else {}
    )
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def wav2vec2_param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel PartitionSpec for a wav2vec2 param by tree path.

    Column-parallel (shard output dim): q/k/v projections, FFN intermediate.
    Row-parallel (shard input dim): attention out_proj, FFN output.
    Everything else replicated. Head count (12) and FFN width (3072) divide
    evenly for model-axis sizes 2, 3, 4, 6, 12.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    is_kernel = joined.endswith("kernel")
    if any(f"{n}_proj" in joined for n in ("q", "k", "v")) or "intermediate_dense" in joined:
        if is_kernel:
            return P(None, MODEL_AXIS)  # (in, out) column-split
        return P(MODEL_AXIS)  # bias follows the output dim
    if "out_proj" in joined or "output_dense" in joined:
        if is_kernel:
            return P(MODEL_AXIS, None)  # row-split; GSPMD psums the partial sums
        return P()  # bias replicated (added after the reduce)
    return P()


def shard_params_tensor_parallel(mesh: Mesh, params):
    """Apply :func:`wav2vec2_param_spec` over a param tree and device_put."""
    def put(path, leaf):
        spec = wav2vec2_param_spec(path, leaf)
        # only shard when the dimension actually divides
        try:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        except ValueError:
            return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, params)


def shard_state_tensor_parallel(mesh: Mesh, tree):
    """Place a full training-state pytree for DP × TP training.

    Every leaf under an ``audio_encoder`` subtree gets its wav2vec2 TP spec
    — this covers the params AND the optimizer moments, whose tree paths
    mirror the param tree (:func:`wav2vec2_param_spec` matches on leaf-name
    substrings, so the optimizer-state prefix is irrelevant). Everything
    else replicates. Complements :func:`shard_params_tensor_parallel`,
    which places a bare encoder param tree.
    """
    def put(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        in_encoder = any(str(n) == "audio_encoder" for n in names)
        spec = wav2vec2_param_spec(path, leaf) if in_encoder else P()
        try:
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        except ValueError:  # dimension doesn't divide the axis
            return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, tree)
