"""wav2vec2-base encoder in Flax, with the FaceFormer fps adapter.

A from-scratch JAX implementation of the HF wav2vec2-base architecture the
reference depends on (facebook/wav2vec2-base-960h), covering exactly the
pipeline the reference's patched model runs (src/model/wav2vec.py:91-189):

  conv feature encoder (7 layers, group-norm first, GELU)
  -> [vocaset fps adapter: align_corners linear interp 50 fps -> frame_num,
      src/model/wav2vec.py:76-84,125-128]
  -> feature projection (LayerNorm + 512->768)
  -> [SpecAugment time masking when training, src/model/wav2vec.py:149-162]
  -> grouped positional conv embedding (k=128, 16 groups, weight-normed)
  -> 12 post-LN transformer layers (768 d, 12 heads, 3072 ffn, exact GELU)

TPU-native notes: the conv encoder runs as NHC ``lax.conv_general_dilated``
(MXU); self-attention goes through the Pallas flash kernel on TPU
(ops/attention.py) so long feature sequences never materialize (T, T) scores
in HBM; all shapes are static under jit (frame_num is a compile-time bucket).

Weights convert from the PyTorch checkpoint via
``audio2face_tpu.compat.wav2vec2_convert.convert_wav2vec2``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio2face_tpu.models.layers import dot_precision
from audio2face_tpu.ops.attention import flash_attention
from audio2face_tpu.ops.dsp import interp_linear


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (defaults = wav2vec2-base-960h)."""

    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    # feature-axis SpecAugment (reference branch src/model/wav2vec.py:162-173;
    # base-960h ships mask_feature_prob=0 so it is off by default)
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    # train-time regularization matching HF wav2vec2-base: dropout on the
    # attention probabilities and stochastic layer skipping (LayerDrop)
    attention_dropout: float = 0.1
    layerdrop: float = 0.1

    def feat_extract_output_length(self, input_length: int) -> int:
        length = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


class MaskedGroupNorm(nn.Module):
    """Per-channel normalization over time with optional length masking.

    With ``feat_lengths=None`` this equals HF's GroupNorm(groups=channels).
    With lengths, statistics use only valid positions — wav2vec2-base's group
    norm is otherwise padding-sensitive (the whole sequence shifts when a
    batch is padded), which is why the reference is stuck at batch_size=1
    for faceformer; masked stats make padded batching exact on the prefix.

    Setup-style so the fused Pallas conv-encoder path can read ``scale`` /
    ``bias`` directly (it computes the GN statistics analytically in-kernel).
    """

    channels: int = 512
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.channels,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.channels,))

    def __call__(self, h, feat_lengths=None):  # h: (B, T, C)
        scale, bias = self.scale, self.bias
        h32 = h.astype(jnp.float32)
        # single-pass stats (E[x], E[x^2]): halves the HBM traffic of this
        # memory-bound op on long sequences vs the two-pass mean/var form
        if feat_lengths is None:
            mean = jnp.mean(h32, axis=1, keepdims=True)
            sq = jnp.mean(jnp.square(h32), axis=1, keepdims=True)
        else:
            valid = (
                jnp.arange(h.shape[1])[None, :] < feat_lengths[:, None]
            ).astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(valid, axis=1, keepdims=True), 1.0)
            hv = h32 * valid
            mean = jnp.sum(hv, axis=1, keepdims=True) / n
            sq = jnp.sum(jnp.square(hv), axis=1, keepdims=True) / n
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        out = (h32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out * scale + bias
        return out.astype(h.dtype)


class _ConvParams(nn.Module):
    """Bare conv parameters under the same ``conv{i}/{kernel,bias}`` paths
    nn.Conv would use — declared once, consumed by either the XLA conv path
    or the fused Pallas kernel. (One module per conv layer: kernel and bias
    must share the ``conv{i}`` name scope.)"""

    shape: tuple[int, int, int]  # (k, c_in, c_out)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[-1],))
            if self.use_bias
            else None
        )
        return kernel, bias


class FeatureEncoder(nn.Module):
    """Raw waveform -> (B, T50, 512) latents at ~50 fps.

    Two execution paths over one parameter tree:

    - XLA (default off-TPU / f32 parity): per-layer VALID convs with the
      masked group norm after layer 0 — bit-comparable to the HF torch stack.
    - fused Pallas (TPU + bf16 inference): layer 0 + analytic group-norm
      stats in XLA, layers 1-6 in a single VMEM-resident kernel
      (ops/conv_encoder.py) — one HBM read of the layer-0 output instead of
      six activation round-trips.
    """

    config: Wav2Vec2Config
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, lengths=None, use_pallas: Optional[bool] = None):
        cfg = self.config
        kernels = []
        biases = [] if cfg.conv_bias else None
        c_in = 1
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)):
            kernel, bias = _ConvParams(
                (k, c_in, dim), use_bias=cfg.conv_bias, name=f"conv{i}"
            )()
            kernels.append(kernel)
            if biases is not None:
                biases.append(bias)
            c_in = dim
        gn = MaskedGroupNorm(
            channels=cfg.conv_dim[0], epsilon=cfg.layer_norm_eps,
            dtype=self.dtype, name="group_norm",
        )

        from audio2face_tpu.ops import conv_encoder as ce

        fused_ok = (
            not cfg.conv_bias
            and cfg.conv_kernel == ce.CONV_KERNEL
            and cfg.conv_stride == ce.CONV_STRIDE
            and all(d == ce.C for d in cfg.conv_dim)
            and self.dtype == jnp.bfloat16
        )
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas and fused_ok:
            return ce.fused_conv_encoder(
                x, kernels, gn.scale, gn.bias, lengths
            )

        dtype = self.dtype or jnp.float32
        prec = dot_precision(self.dtype)
        h = x[:, :, None].astype(dtype)  # NWC
        feat_lengths = lengths
        for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
            h = jax.lax.conv_general_dilated(
                h, kernels[i].astype(dtype), window_strides=(s,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
                precision=prec,
            )
            if biases is not None:
                h = h + biases[i].astype(dtype)
            if feat_lengths is not None:
                feat_lengths = (feat_lengths - k) // s + 1
            if i == 0:
                h = gn(h, feat_lengths)
            h = jax.nn.gelu(h, approximate=False)
        return h


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, precision=dot_precision(self.dtype), name="projection")(x)
        if train:
            x = nn.Dropout(0.1, deterministic=False)(x)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding (k=128, groups=16).

    The PyTorch layer is weight-normed; conversion folds g*v/||v|| into a
    plain kernel, which is numerically identical at inference and a cleaner
    parameterization for XLA.
    """

    config: Wav2Vec2Config
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        cfg = self.config
        k = cfg.pos_conv_kernel
        pad = k // 2
        h = nn.Conv(
            cfg.hidden_size, (k,), strides=(1,), padding=[(pad, pad)],
            feature_group_count=cfg.pos_conv_groups, dtype=self.dtype,
            precision=dot_precision(self.dtype), name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]  # HF SamePadLayer removes the extra step for even k
        return jax.nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    """Post-LN transformer layer (do_stable_layer_norm=False, base config)."""

    config: Wav2Vec2Config
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, kv_lengths=None, *, train: bool = False, use_pallas=None,
                 time_axis: Optional[str] = None):
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_heads
        hd = d // nh

        prec = dot_precision(self.dtype)
        residual = x
        q = nn.Dense(d, dtype=self.dtype, precision=prec, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, precision=prec, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, precision=prec, name="v_proj")(x)

        def split_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

        k, v = split_heads(k), split_heads(v)
        if time_axis is not None:
            # sequence parallelism (shard_map over the time axis): queries,
            # projections, FFN, and norms are token-local; only attention
            # needs the full sequence, so K/V all-gather over the mesh axis
            # (device order == global time order). kv_lengths are global
            # column counts and mask identically on every chip.
            k = jax.lax.all_gather(k, time_axis, axis=2, tiled=True)
            v = jax.lax.all_gather(v, time_axis, axis=2, tiled=True)

        attn = flash_attention(
            split_heads(q), k, v,
            kv_lengths=kv_lengths, use_pallas=use_pallas,
            # HF wav2vec2-base trains with attention_dropout=0.1 on the
            # softmax probabilities (routes through the XLA path)
            dropout_rate=cfg.attention_dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if (train and cfg.attention_dropout > 0) else None,
        )
        b, _, s, _ = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        attn = nn.Dense(d, dtype=self.dtype, precision=prec, name="out_proj")(attn)
        if train:
            attn = nn.Dropout(0.1, deterministic=False)(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(
            residual + attn
        )

        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, precision=prec, name="intermediate_dense")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        if train:
            ff = nn.Dropout(0.1, deterministic=False)(ff)
        ff = nn.Dense(d, dtype=self.dtype, precision=prec, name="output_dense")(ff)
        if train:
            ff = nn.Dropout(0.1, deterministic=False)(ff)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x + ff)


def compute_spec_augment_mask(
    rng: jax.Array,
    batch: int,
    seq_len: int,
    mask_prob: float,
    mask_length: int,
    min_masks: int = 0,
) -> jnp.ndarray:
    """SpecAugment span mask (B, seq_len) boolean, jit-friendly equivalent of
    the reference's numpy ``_compute_mask_indices`` (src/model/wav2vec.py:
    25-72): ~mask_prob fraction of positions masked in spans of mask_length,
    at least min_masks spans. Used along the time axis (positions replaced by
    the learned masked embedding) and, when mask_feature_prob > 0, along the
    feature axis (channels zeroed; src/model/wav2vec.py:162-173)."""
    num_masks = max(
        min_masks,
        int(mask_prob * seq_len / mask_length + 0.5),
    )
    starts = jax.random.randint(
        rng, (batch, num_masks), 0, max(seq_len - mask_length, 1)
    )
    positions = starts[..., None] + jnp.arange(mask_length)  # (B, M, L)
    t = jnp.arange(seq_len)
    return (positions[..., None] == t).any(axis=(1, 2))


class Wav2Vec2Encoder(nn.Module):
    """Full encoder: waveform -> (B, T, 768) hidden states.

    ``output_len`` activates the reference's vocaset fps adapter (linear
    interp of the 50 fps conv latents to frame_num; src/model/wav2vec.py:
    125-128). ``lengths`` optionally provides per-item valid *sample* counts
    for padded batches (a capability the bs=1 reference lacks).
    """

    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,  # (B, L)
        output_len: Optional[int] = None,
        lengths: Optional[jnp.ndarray] = None,
        output_lengths: Optional[jnp.ndarray] = None,
        *,
        dataset: str = "vocaset",
        train: bool = False,
        apply_spec_augment: bool = False,
        use_pallas: Optional[bool] = None,
        pre_layers_only: bool = False,
    ):
        cfg = self.config
        # the fused conv kernel is inference-only (no VJP); training takes
        # the differentiable XLA conv path, REMATERIALIZED in the backward:
        # the 7 conv layers' saved activations are the single largest
        # training buffer (~(B, L/5, 512) at the top layer — ~1 GB at
        # bs=16 x 10 s) while their recompute is a few ms of MXU work
        fe_cls = (
            nn.remat(FeatureEncoder, static_argnums=(3,))
            if train
            else FeatureEncoder
        )
        h = fe_cls(cfg, dtype=self.dtype, name="feature_encoder")(
            input_values, lengths, False if train else use_pallas
        )

        feat_lengths = None
        if lengths is not None:
            feat_lengths = lengths
            for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
                feat_lengths = (feat_lengths - k) // s + 1

        if dataset == "biwi":
            # reference BIWI trim branch (src/model/wav2vec.py:119-124):
            # even-length trim, then cap at 2x the frame count (25 fps video
            # against 50 fps latents — no interpolation). Static shape logic
            # under jit.
            if h.shape[1] % 2 != 0:
                h = h[:, :-1]
            if output_len is not None and h.shape[1] > output_len * 2:
                h = h[:, : output_len * 2]
            if feat_lengths is not None:
                feat_lengths = jnp.minimum(feat_lengths, h.shape[1])
        elif output_len is not None:
            if lengths is None:
                h = interp_linear(h, output_len, axis=1, align_corners=True)
            else:
                # per-item frame count: frame_num = samples * 60 // 16000
                # semantics generalized — the caller supplies output frames
                # proportional to output_len over the padded bucket
                from audio2face_tpu.ops.dsp import interp_linear_per_item

                if output_lengths is None:
                    # lengths * output_len overflows int32 for 60 s clips
                    # (960000 * 3600 > 2^31; x64 is disabled so int64 casts
                    # silently stay int32) — reduce the static ratio by its
                    # gcd first, then split into quotient/remainder pieces.
                    # The remainder product rem * ol < il * ol can STILL
                    # overflow when the reduced ratio is near-coprime; that
                    # is a static property, so fail loudly instead of
                    # silently wrapping (callers then pass output_lengths,
                    # as FaceFormer always does).
                    import math as _math

                    g = _math.gcd(output_len, input_values.shape[1])
                    ol, il = output_len // g, input_values.shape[1] // g
                    if il * ol >= 2**31:
                        raise ValueError(
                            "per-item frame counts cannot be derived in "
                            f"int32 for output_len={output_len} over "
                            f"{input_values.shape[1]} samples (reduced "
                            f"ratio {ol}/{il}); pass output_lengths "
                            "explicitly"
                        )
                    quot, rem = lengths // il, lengths % il
                    output_lengths = (quot * ol + (rem * ol) // il).astype(jnp.int32)
                h = interp_linear_per_item(h, output_len, feat_lengths, output_lengths)
                feat_lengths = output_lengths

        h = FeatureProjection(cfg, dtype=self.dtype, name="feature_projection")(h, train=train)

        # created unconditionally so the param tree is identical in train/eval
        masked_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
        )
        if train and apply_spec_augment and cfg.mask_time_prob > 0:
            mask = compute_spec_augment_mask(
                self.make_rng("spec_augment"), h.shape[0], h.shape[1],
                cfg.mask_time_prob, cfg.mask_time_length, cfg.mask_time_min_masks,
            )
            h = jnp.where(mask[..., None], masked_embed.astype(h.dtype), h)
        if train and apply_spec_augment and cfg.mask_feature_prob > 0:
            # feature-axis branch (src/model/wav2vec.py:162-173): masked
            # channels are zeroed across every time step
            fmask = compute_spec_augment_mask(
                self.make_rng("spec_augment"),  # fresh fold per make_rng call
                h.shape[0], h.shape[2],
                cfg.mask_feature_prob, cfg.mask_feature_length,
            )
            h = jnp.where(fmask[:, None, :], jnp.zeros((), h.dtype), h)

        if feat_lengths is not None:
            # zero padded positions before the (global) positional conv
            valid = jnp.arange(h.shape[1])[None, :] < feat_lengths[:, None]
            h = h * valid[..., None].astype(h.dtype)

        h = h + PositionalConvEmbedding(cfg, dtype=self.dtype, name="pos_conv_embed")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(h)
        if train:
            h = nn.Dropout(0.1, deterministic=False)(h)

        if pre_layers_only:
            # sequence-parallel split point (parallel/sequence.py): everything
            # above is O(T) token-or-window local; the transformer stack below
            # is what shards over the mesh's time axis
            return h, feat_lengths

        for i in range(cfg.num_layers):
            out = EncoderLayer(cfg, dtype=self.dtype, name=f"layer{i}")(
                h, kv_lengths=feat_lengths, train=train, use_pallas=use_pallas
            )
            if train and cfg.layerdrop > 0.0:
                # HF LayerDrop: the whole layer is skipped for the whole
                # batch with prob layerdrop (training only)
                keep = jnp.logical_not(
                    jax.random.bernoulli(self.make_rng("dropout"), cfg.layerdrop)
                )
                h = jnp.where(keep, out, h)
            else:
                h = out
        return h
