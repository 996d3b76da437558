"""VOCA — DeepSpeech-style windowed feature encoder with 8-subject styles.

Architecture parity with the reference (src/model/voca.py:5-52): input is a
(B, 29, 16) feature window (29 DeepSpeech-alphabet-like features × 16 time
steps, produced by an MFCC extractor with n_mfcc=16/out_dim=29 per the spec
at voca.py:11-17); the one-hot is truncated to the first 8 training subjects
and tiled to an (8, 16) block, giving 29+8=37 input channels; four
(3,1)/stride-(2,1) time convs (32→32→64→64, ReLU, no BN) collapse the 16
time steps to 1; the head is ``Linear[64+8 → 72 → 128 → tanh → 50 → n_verts]``
plus the template. (The reference's stray debug print at voca.py:43 is not
reproduced.)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audio2face_tpu.models.layers import TorchConv, VertexDecoderMLP, tile_onehot_rows

TIME_CONV_CHANNELS = (32, 32, 64, 64)


class Voca(nn.Module):
    n_verts: int
    n_onehot: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, one_hot, template, *, train: bool = False):
        """x: (B, 29, 16) features; one_hot: (B, >=8); template: (B, V, 3)."""
        bs = x.shape[0]
        one_hot8 = one_hot[:, :8]
        onehot_img = tile_onehot_rows(one_hot8, 8, x.shape[2])
        h = jnp.concatenate([x, onehot_img], axis=1)  # (B, 37, 16)
        # torch permutes to channels=37, H=16(time), W=1; NHWC: (B, 16, 1, 37)
        h = jnp.transpose(h, (0, 2, 1))[:, :, None, :].astype(self.dtype or jnp.float32)

        for i, ch in enumerate(TIME_CONV_CHANNELS):
            h = TorchConv(ch, (3, 1), (2, 1), (1, 0), dtype=self.dtype, name=f"time_conv{i}")(h)
            h = nn.relu(h)

        h = h.reshape(bs, -1)  # (B, 64)
        h = jnp.concatenate([h, one_hot8.astype(h.dtype)], axis=1)
        out = VertexDecoderMLP(self.n_verts, dtype=self.dtype, name="decoder")(h)
        out = out.astype(jnp.float32)
        return out.reshape(bs, -1, 3) + template
