"""Song2Face — experimental conv + LSTM singing-voice variant.

Architecture parity with the reference (src/model/song2face.py:5-81): input is
a (B, 52, 32) feature image with the tiled 12-dim one-hot concatenated below
(64 rows); five conv_bn blocks ((1,5)/(1,3) kernels, stride (1,2)) collapse
the 32-wide axis to 1 (channels 1→72→108→162→243→256); the (B, 256, 64)
result feeds two stacked unidirectional LSTMs (64→256→256 — the reference
names them ``bi_lstm`` but sets bidirectional=False, song2face.py:22-29, and
treats the 256 conv channels as the time axis); the hidden axis is bilinearly
compressed 256→32; a 4-block regression conv stack ((3,1)/stride (2,1), last
block without BN) collapses it to 1; the head is the shared vertex MLP on
``[256 ⊕ one_hot]`` plus the template.

The LSTMs run as ``jax.lax.scan`` cells (TPU replacement for cuDNN LSTM);
everything else is fused XLA convs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audio2face_tpu.models.layers import (
    ScanLSTM,
    TorchBatchNorm,
    TorchConv,
    VertexDecoderMLP,
    tile_onehot_rows,
)

from audio2face_tpu.ops.dsp import interp_linear

ENCODER_BLOCKS = (
    # (features, kernel_w, pad_w)
    (72, 5, 2),
    (108, 5, 2),
    (162, 3, 1),
    (243, 3, 1),
    (256, 3, 1),
)


class Song2Face(nn.Module):
    n_verts: int
    n_onehot: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, one_hot, template, *, train: bool = False):
        """x: (B, 52, 32) features; one_hot: (B, 12); template: (B, V, 3)."""
        bs = x.shape[0]
        onehot_img = tile_onehot_rows(one_hot, self.n_onehot, x.shape[2])
        h = jnp.concatenate([x, onehot_img], axis=1)[..., None].astype(
            self.dtype or jnp.float32
        )  # NHWC (B, 64, 32, 1)

        for i, (ch, kw, pw) in enumerate(ENCODER_BLOCKS):
            h = TorchConv(ch, (1, kw), (1, 2), (0, pw), dtype=self.dtype, name=f"enc{i}")(h)
            h = TorchBatchNorm(dtype=self.dtype, name=f"enc{i}_bn")(h, train)
            h = nn.relu(h)
        # (B, 64, 1, 256) -> sequence over the 256 channels, features = 64 rows
        h = jnp.transpose(h[:, :, 0, :], (0, 2, 1))  # (B, 256, 64)

        h = ScanLSTM(256, dtype=self.dtype, name="lstm1")(h)
        h = ScanLSTM(256, dtype=self.dtype, name="lstm2")(h)  # (B, 256, 256)

        # bilinear compression of the hidden axis 256 -> 32 (reference
        # F.interpolate size=(32, 1), song2face.py:70)
        h = interp_linear(h, 32, axis=2, align_corners=False)  # (B, 256, 32)
        # regression stack: NCHW (B, C=256seq, H=32, W=1) -> NHWC (B, 32, 1, 256)
        h = jnp.transpose(h, (0, 2, 1))[:, :, None, :]
        for i in range(3):
            h = TorchConv(256, (3, 1), (2, 1), (1, 0), dtype=self.dtype, name=f"reg{i}")(h)
            h = TorchBatchNorm(dtype=self.dtype, name=f"reg{i}_bn")(h, train)
            h = nn.relu(h)
        h = TorchConv(256, (3, 1), (2, 1), (0, 0), dtype=self.dtype, name="reg3")(h)
        h = nn.relu(h)

        h = h.reshape(bs, -1)  # (B, 256)
        h = jnp.concatenate([h, one_hot.astype(h.dtype)], axis=1)
        out = VertexDecoderMLP(self.n_verts, dtype=self.dtype, name="output")(h)
        out = out.astype(jnp.float32)
        return out.reshape(bs, -1, 3) + template
