"""Shared building blocks for the frame models.

Conventions: activations are NHWC (TPU-native layout — channels on the lane
dimension feed the MXU/VPU directly, unlike the reference's NCHW), conv
kernels are HWIO. PyTorch-semantics helpers (explicit padding, BatchNorm with
running stats, torch-gate-order LSTM) keep checkpoint conversion exact.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def dot_precision(dtype) -> jax.lax.Precision | None:
    """Matmul precision for a compute dtype: bf16/f16 use the native fast
    path (None = backend default); f32 requests HIGHEST, because TPU's
    default silently truncates f32 matmul inputs to bf16 — fatal for the
    <1e-4 checkpoint-parity bar."""
    if dtype is not None and jnp.dtype(dtype) in (
        jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)
    ):
        return None
    return jax.lax.Precision.HIGHEST


class TorchConv(nn.Module):
    """Conv2d with torch-style explicit symmetric padding; NHWC/HWIO."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=[(p, p) for p in self.padding],
            use_bias=self.use_bias,
            dtype=self.dtype,
            precision=dot_precision(self.dtype),
            name="conv",
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps=1e-5, momentum=0.1 torch-style =
    0.9 flax-style), running stats in the ``batch_stats`` collection."""

    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class VertexDecoderMLP(nn.Module):
    """The shared vertex head ``[in -> 72 -> 128 -> tanh -> 50 -> n_verts]``
    used by Audio2Mesh, VOCA and Song2Face (reference: src/model/audio2face.py
    :49-55, voca.py:30-36, song2face.py:42-48). Note the reference applies
    tanh only after the second linear; all other layers are purely linear."""

    n_verts: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        prec = dot_precision(self.dtype)
        x = nn.Dense(72, dtype=self.dtype, precision=prec, name="fc0")(x)
        x = nn.Dense(128, dtype=self.dtype, precision=prec, name="fc1")(x)
        x = jnp.tanh(x)
        x = nn.Dense(50, dtype=self.dtype, precision=prec, name="fc2")(x)
        x = nn.Dense(self.n_verts, dtype=self.dtype, precision=prec, name="fc3")(x)
        return x


def tile_onehot_rows(one_hot: jnp.ndarray, n_rows: int, width: int) -> jnp.ndarray:
    """Reproduce the reference's one-hot tiling
    ``one_hot.repeat(1, width).view(bs, n_rows, width)``
    (src/model/audio2face.py:59, voca.py:41, song2face.py:62).

    Because ``n_rows * width`` is read row-major from ``width`` copies of the
    one-hot vector, rows are *rotated* copies when width % n_onehot != 0 —
    an exact reproduction matters for checkpoint parity.
    """
    bs, n_onehot = one_hot.shape
    flat = jnp.tile(one_hot, (1, (n_rows * width) // n_onehot))
    return flat.reshape(bs, n_rows, width)


class ScanLSTM(nn.Module):
    """Unidirectional LSTM with torch gate order (i, f, g, o), batch_first,
    implemented as a ``jax.lax.scan`` over time — the TPU replacement for the
    reference's cuDNN nn.LSTM (src/model/song2face.py:22-29)."""

    hidden_size: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):  # x: (B, T, F)
        b, t, f = x.shape
        h4 = 4 * self.hidden_size

        def torch_lstm_init(key, shape, dtype=jnp.float32):
            # torch initializes every LSTM param U(-k, k), k = 1/sqrt(hidden)
            k = 1.0 / self.hidden_size**0.5
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", torch_lstm_init, (f, h4))
        w_hh = self.param("w_hh", torch_lstm_init, (self.hidden_size, h4))
        b_ih = self.param("b_ih", torch_lstm_init, (h4,))
        b_hh = self.param("b_hh", torch_lstm_init, (h4,))

        prec = dot_precision(self.dtype)
        cdt = self.dtype or jnp.float32
        # recurrent weights cast to the compute dtype (the conv layers'
        # policy): a float32 w_hh would promote the scan carry to float32
        # mid-loop and break the carry-type invariant under bf16 compute
        w_hh_c = w_hh.astype(cdt)
        # hoist the input projection out of the scan: one big MXU matmul
        x_proj = (jnp.matmul(x, w_ih, precision=prec) + b_ih + b_hh).astype(cdt)

        def step(carry, xt):
            h, c = carry
            gates = xt + jnp.matmul(h, w_hh_c, precision=prec)
            i, fg, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            fg = jax.nn.sigmoid(fg)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = fg * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.hidden_size), cdt)
        c0 = jnp.zeros((b, self.hidden_size), cdt)
        (_, _), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def conv_stack(
    x: jnp.ndarray,
    blocks: Sequence[dict],
    train: bool,
    dtype=None,
):
    """Apply a sequence of conv/bn/relu blocks described by dicts with keys
    ``features, kernel, stride, pad, bn (bool), relu (bool), name``."""
    for blk in blocks:
        x = TorchConv(
            features=blk["features"],
            kernel_size=blk["kernel"],
            strides=blk["stride"],
            padding=blk["pad"],
            dtype=dtype,
            name=blk["name"],
        )(x)
        if blk.get("bn", True):
            x = TorchBatchNorm(dtype=dtype, name=blk["name"] + "_bn")(x, train)
        if blk.get("relu", True):
            x = nn.relu(x)
    return x
