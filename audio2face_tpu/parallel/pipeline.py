"""Pipeline parallelism: the wav2vec2 transformer stack split into stages
over the mesh, microbatches streamed GPipe-style between them.

Completes the parallelism matrix next to data (`mesh.py`), tensor
(`wav2vec2_param_spec`) and sequence (`sequence.py`) parallelism. The
reference has no distributed support at all (SURVEY §2.3: single-process
Lightning), so there is no counterpart to match — this is the TPU-native
scaling story for when the encoder's weights or activation residency are
the limiter rather than FLOPs.

Design (idiomatic TPU pipelining, not a port of anything):

- The 12 encoder layers are split into ``n_stages`` contiguous stages, one
  per device along the chosen mesh axis. Per-stage layer params are stacked
  on a leading axis and sharded with ``P(axis)``, so each chip holds ONLY
  its own stage's weights — the point of PP.
- The batch is cut into ``n_micro`` microbatches. A ``lax.scan`` runs the
  classic GPipe schedule of ``n_micro + n_stages - 1`` ticks: every tick,
  each chip applies its stage (an inner ``lax.scan`` over its layers) to
  its buffer, then the activations shift one stage down the ring via
  ``lax.ppermute`` — pure ICI neighbour traffic, no host involvement.
- Attention is token-local per microbatch (full T per tick), so per-item
  valid lengths travel with the activations and mask identically to the
  unsharded encoder; outputs match to float round-off
  (``tests/test_pipeline_parallel.py``).
- The whole schedule is differentiable (scan + ppermute have exact
  transposes), so ``jax.grad`` through :func:`pipeline_parallel_layers`
  yields pipeline-parallel BACKWARD too — XLA replays the ring in reverse.
  Gradient parity is tested.

The warm-up/drain bubble costs ``(n_stages - 1) / (n_micro + n_stages - 1)``
of the ticks, the usual GPipe trade; pick ``n_micro >= n_stages`` where the
batch allows. Stage results are returned via a stage-axis ``psum`` of the
last stage's (zero-masked) buffer — one collective for the whole call.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audio2face_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.parallel.mesh import MODEL_AXIS, shard_map_data


def stack_stage_params(params: dict, n_stages: int, config: Wav2Vec2Config):
    """Stack ``layer{i}`` param subtrees to leaves of shape
    ``(n_stages, layers_per_stage, ...)`` — the leading axis is the one
    sharded over the pipeline axis."""
    n_layers = config.num_layers
    if n_layers % n_stages != 0:
        raise ValueError(
            f"num_layers={n_layers} must divide evenly into {n_stages} stages"
        )
    per = n_layers // n_stages
    layers = [params[f"layer{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked
    )


def pipeline_parallel_layers(
    params: dict,
    h: jnp.ndarray,
    mesh,
    *,
    n_micro: Optional[int] = None,
    feat_lengths: Optional[jnp.ndarray] = None,
    config: Wav2Vec2Config = Wav2Vec2Config(),
    dtype=None,
    use_pallas: Optional[bool] = None,
    axis: str = MODEL_AXIS,
    data_axis: Optional[str] = None,
):
    """Run the transformer stack pipeline-parallel over ``mesh``'s ``axis``.

    params: the encoder's param tree (``variables["params"]`` of
    ``Wav2Vec2Encoder`` — only its ``layer{i}`` subtrees are read).
    h: (B, T, D) hidden states at the ``pre_layers_only`` split point.
    n_micro: microbatch count (must divide B; default: B, i.e. microbatch
    size 1 — maximal overlap).
    feat_lengths: optional (B,) valid token counts for padded batches.
    data_axis: optionally ALSO shard the microbatch dim over this mesh
    axis (DP x PP on a 2-D mesh; B/n_micro must divide by its size).
    Returns (B, T, D).
    """
    n_stages = mesh.shape[axis]
    b, t, d = h.shape
    if n_micro is None:
        n_micro = b
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    mb = b // n_micro
    if data_axis is not None and mb % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"microbatch size {mb} not divisible by mesh axis "
            f"{data_axis!r}={mesh.shape[data_axis]}"
        )

    stacked = stack_stage_params(params, n_stages, config)
    x = h.reshape(n_micro, mb, t, d)
    if feat_lengths is None:
        kvlen = jnp.full((n_micro, mb), t, jnp.int32)
    else:
        kvlen = feat_lengths.astype(jnp.int32).reshape(n_micro, mb)

    n_steps = n_micro + n_stages - 1
    last = n_stages - 1
    ring = [(k, (k + 1) % n_stages) for k in range(n_stages)]

    def body(lp, x_all, kl_all):
        # local stage shard: leading dim 1 -> (layers_per_stage, ...)
        lp_local = jax.tree.map(lambda a: a[0], lp)
        s = jax.lax.axis_index(axis)
        mb_local = x_all.shape[1]

        def apply_stage(xb, kl):
            def layer_step(xc, one_layer):
                y = EncoderLayer(config, dtype=dtype).apply(
                    {"params": one_layer}, xc, kv_lengths=kl,
                    use_pallas=use_pallas,
                )
                return y, None
            y, _ = jax.lax.scan(layer_step, xb, lp_local)
            return y

        buf = jnp.zeros((mb_local, t, d), x_all.dtype)
        klbuf = jnp.full((mb_local,), t, jnp.int32)
        out = jnp.zeros((n_micro, mb_local, t, d), x_all.dtype)

        def step(carry, i):
            buf, klbuf, out = carry
            idx = jnp.clip(i, 0, n_micro - 1)
            feed = jnp.logical_and(s == 0, i < n_micro)
            buf = jnp.where(
                feed, jax.lax.dynamic_index_in_dim(x_all, idx, 0, keepdims=False), buf
            )
            klbuf = jnp.where(
                feed, jax.lax.dynamic_index_in_dim(kl_all, idx, 0, keepdims=False), klbuf
            )
            y = apply_stage(buf, klbuf)
            # microbatch j's final activations arrive at the last stage on
            # tick j + n_stages - 1 — exactly once each, so the write mask
            # below never clobbers a valid slot with pipeline-bubble junk.
            j = i - last
            jc = jnp.clip(j, 0, n_micro - 1)
            write = jnp.logical_and(s == last, j >= 0)
            slot = jnp.where(
                write, y, jax.lax.dynamic_index_in_dim(out, jc, 0, keepdims=False)
            )
            out = jax.lax.dynamic_update_index_in_dim(out, slot, jc, 0)
            buf = jax.lax.ppermute(y, axis, ring)
            klbuf = jax.lax.ppermute(klbuf, axis, ring)
            return (buf, klbuf, out), None

        (_, _, out), _ = jax.lax.scan(
            step, (buf, klbuf, out), jnp.arange(n_steps)
        )
        # only the last stage holds real outputs; one stage-axis psum of the
        # zero-masked buffer replicates them (the call's single collective
        # besides the ring shifts)
        return jax.lax.psum(jnp.where(s == last, out, 0), axis)

    mb_spec = data_axis  # None -> replicated microbatch dim
    fn = shard_map_data(
        mesh, body,
        in_specs=(P(axis), P(None, mb_spec, None, None), P(None, mb_spec)),
        out_specs=P(None, mb_spec, None, None),
    )
    out = fn(stacked, x, kvlen)
    return out.reshape(b, t, d)


def pipeline_parallel_encode(
    variables: dict,
    input_values: jnp.ndarray,
    mesh,
    *,
    n_micro: Optional[int] = None,
    output_len: Optional[int] = None,
    lengths: Optional[jnp.ndarray] = None,
    output_lengths: Optional[jnp.ndarray] = None,
    config: Wav2Vec2Config = Wav2Vec2Config(),
    dtype=None,
    use_pallas: Optional[bool] = None,
    axis: str = MODEL_AXIS,
    data_axis: Optional[str] = None,
):
    """Full waveform -> hidden states with the transformer stack
    pipeline-parallel. Drop-in for ``Wav2Vec2Encoder.apply`` at inference
    (same variables, same output; ``tests/test_pipeline_parallel.py``)."""
    encoder = Wav2Vec2Encoder(config, dtype=dtype)
    h, feat_lengths = encoder.apply(
        variables, input_values, output_len, lengths, output_lengths,
        use_pallas=use_pallas, pre_layers_only=True,
    )
    return pipeline_parallel_layers(
        variables["params"], h, mesh,
        n_micro=n_micro, feat_lengths=feat_lengths, config=config,
        dtype=dtype, use_pallas=use_pallas, axis=axis, data_axis=data_axis,
    )
