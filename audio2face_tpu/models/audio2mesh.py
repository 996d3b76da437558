"""Audio2Mesh — NVIDIA formant-analysis conv stack + identity-conditioned MLP.

Architecture parity with the reference (src/model/audio2face.py:5-69):
input is a (B, out_dim=52, n_mfcc=32) MFCC feature image; the 12-dim identity
one-hot is tiled to a (12, 32) block and concatenated below it (rows 52..63);
a 5-layer (1,3)/stride-(1,2) "analysis" stack collapses the 32-wide feature
axis (channels 1→72→108→162→243→256, BatchNorm+ReLU each); a 5-layer
(3,1)/stride-(2,1) "articulation" stack collapses the 64-tall time axis to 1
(with the reference's exact — irregular — BN placement, audio2face.py:31-47);
the vertex head is ``Linear[256+12 → 72 → 128 → tanh → 50 → n_verts]`` on the
concatenation with the raw one-hot, plus the template.

TPU-native differences: NHWC layout, channels on lanes; runs as one fused XLA
graph under jit; optional bf16 compute with f32 params.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audio2face_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    VertexDecoderMLP,
    tile_onehot_rows,
)

ANALYSIS_CHANNELS = (72, 108, 162, 243, 256)


class Audio2Mesh(nn.Module):
    n_verts: int
    n_onehot: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, one_hot, template, *, train: bool = False):
        """x: (B, 52, 32) features; one_hot: (B, 12); template: (B, V, 3)."""
        bs = x.shape[0]
        onehot_img = tile_onehot_rows(one_hot, self.n_onehot, x.shape[2])
        # rows: 52 feature rows then 12 one-hot rows -> (B, 64, 32, 1) NHWC
        h = jnp.concatenate([x, onehot_img], axis=1)[..., None].astype(
            self.dtype or jnp.float32
        )

        # analysis: collapse the 32-wide feature axis
        for i, ch in enumerate(ANALYSIS_CHANNELS):
            h = TorchConv(ch, (1, 3), (1, 2), (0, 1), dtype=self.dtype, name=f"analysis{i}")(h)
            h = TorchBatchNorm(dtype=self.dtype, name=f"analysis{i}_bn")(h, train)
            h = nn.relu(h)

        # articulation: collapse the 64-tall time axis; BN placement mirrors
        # the reference exactly (conv/bn/relu ×3, then bn,conv,relu,bn,conv,relu)
        for i in range(3):
            h = TorchConv(256, (3, 1), (2, 1), (1, 0), dtype=self.dtype, name=f"artic{i}")(h)
            h = TorchBatchNorm(dtype=self.dtype, name=f"artic{i}_bn")(h, train)
            h = nn.relu(h)
        h = TorchBatchNorm(dtype=self.dtype, name="artic3_pre_bn")(h, train)
        h = TorchConv(256, (3, 1), (2, 1), (1, 0), dtype=self.dtype, name="artic3")(h)
        h = nn.relu(h)
        h = TorchBatchNorm(dtype=self.dtype, name="artic4_pre_bn")(h, train)
        h = TorchConv(256, (4, 1), (4, 1), (0, 0), dtype=self.dtype, name="artic4")(h)
        h = nn.relu(h)

        h = h.reshape(bs, -1)  # (B, 256)
        h = jnp.concatenate([h, one_hot.astype(h.dtype)], axis=1)
        out = VertexDecoderMLP(self.n_verts, dtype=self.dtype, name="output")(h)
        out = out.astype(jnp.float32)
        return out.reshape(bs, -1, 3) + template
