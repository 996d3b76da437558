"""Sequence (context) parallelism: one long clip across the whole mesh.

Data parallelism shards independent clips; this shards the TIME axis of a
single wav2vec2 forward over the mesh's ``data`` axis — the scaling story
for long-form audio, where encoder self-attention is O(T^2) and a 10-min
clip on one chip costs ~100x a 1-min clip. (The reference caps FaceFormer
input at 10 s / 600 frames — src/model/faceformer.py:119 — so it has no
counterpart at all.)

Split point: everything up to the transformer stack (conv feature encoder,
fps interp, feature projection, positional conv, layer norm) is O(T) and
window-local, so it runs unsharded — it is a rounding error next to the
stack. The 12 transformer layers then run under ``shard_map`` with hidden
states sharded on time: q/k/v projections, FFN, and layer norms are
token-local; only attention needs the full sequence, so each layer
all-gathers K and V over the mesh axis (``EncoderLayer(time_axis=...)``)
and runs the flash kernel with local queries against global keys. With
T/n queries per chip, compute scales ~n-fold and the gathered K/V
(T x 768 x 2 per layer) rides ICI.

Padded tail rows (T rounded up to the mesh axis) are excluded from
attention via ``kv_lengths`` and sliced off at the end, so results match
the unsharded encoder to float round-off.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audio2face_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.parallel.mesh import DATA_AXIS, shard_map_data
from audio2face_tpu.utils.shapes import round_up as _round_up


def sequence_parallel_layers(
    params: dict,
    h: jnp.ndarray,
    mesh,
    *,
    feat_lengths: Optional[jnp.ndarray] = None,
    config: Wav2Vec2Config = Wav2Vec2Config(),
    dtype=None,
    use_pallas: Optional[bool] = None,
    axis: str = DATA_AXIS,
    gather_output: bool = False,
):
    """Run the transformer stack time-sharded over ``mesh``.

    params: the encoder's param tree (``variables["params"]`` of
    ``Wav2Vec2Encoder`` — only its ``layer{i}`` subtrees are read).
    h: (B, T, D) hidden states at the ``pre_layers_only`` split point.
    feat_lengths: optional (B,) valid token counts for padded batches.
    gather_output: all-gather the result inside the shard_map so the
    returned array is REPLICATED over ``axis`` rather than time-sharded.
    Callers that feed the hidden states into ops GSPMD cannot partition
    (the fused Pallas decode kernel in serving) need this — a Pallas
    custom call must see replicated operands, never sharded ones.
    Returns (B, T, D).
    """
    n = mesh.shape[axis]
    b, t, d = h.shape
    t_pad = _round_up(t, n)
    if feat_lengths is None:
        kvlen = jnp.full((b,), t, jnp.int32)
    else:
        kvlen = feat_lengths.astype(jnp.int32)
    if t_pad != t:
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))

    layer_params = {
        f"layer{i}": params[f"layer{i}"] for i in range(config.num_layers)
    }

    def body(lp, x_local, kl):
        for i in range(config.num_layers):
            x_local = EncoderLayer(config, dtype=dtype).apply(
                {"params": lp[f"layer{i}"]}, x_local, kv_lengths=kl,
                use_pallas=use_pallas, time_axis=axis,
            )
        if gather_output:
            x_local = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
        return x_local

    out_spec = P(None, None, None) if gather_output else P(None, axis, None)
    fn = shard_map_data(
        mesh, body,
        in_specs=(P(), P(None, axis, None), P()),
        out_specs=out_spec,
    )
    out = fn(layer_params, h, kvlen)
    return out[:, :t]


def sequence_parallel_encode(
    variables: dict,
    input_values: jnp.ndarray,
    mesh,
    *,
    output_len: Optional[int] = None,
    lengths: Optional[jnp.ndarray] = None,
    output_lengths: Optional[jnp.ndarray] = None,
    config: Wav2Vec2Config = Wav2Vec2Config(),
    dtype=None,
    use_pallas: Optional[bool] = None,
    axis: str = DATA_AXIS,
    gather_output: bool = False,
    dataset: str = "vocaset",
):
    """Full waveform -> hidden states with the transformer stack sharded
    on time. Drop-in for ``Wav2Vec2Encoder.apply`` at inference (same
    variables, same output; ``tests/test_sequence_parallel.py``).

    ``dataset`` selects the pre-layers alignment branch (vocaset 60 fps
    interp vs the BIWI even-trim, src/model/wav2vec.py:119-128) — both are
    window-local and run before the time split, so the sharded stack is
    identical either way."""
    encoder = Wav2Vec2Encoder(config, dtype=dtype)
    h, feat_lengths = encoder.apply(
        variables, input_values, output_len, lengths, output_lengths,
        dataset=dataset, use_pallas=use_pallas, pre_layers_only=True,
    )
    return sequence_parallel_layers(
        variables["params"], h, mesh,
        feat_lengths=feat_lengths, config=config, dtype=dtype,
        use_pallas=use_pallas, axis=axis, gather_output=gather_output,
    )
