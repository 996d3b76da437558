"""Feature extractors: fused-JAX MFCC and wav2vec2 hidden-state features.

Contract parity with the reference extractors (src/model/extractor.py:10-96):
``Extractor(sample_rate, n_feature, out_dim, win_length, hop_length, n_fft)``
called on a (B, L) waveform returns (B, out_dim, n_feature). Unlike the
reference (host-side torchaudio C++ DSP, `.detach()`ed at
src/model/lightning_model.py:115), these are pure functions that fuse into
the jit'd model graph; gradients are stopped at the feature boundary to
preserve the reference's detach semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio2face_tpu.ops import dsp


class MFCCExtractor:
    """MFCC features: (B, L) -> (B, out_dim, n_mfcc).

    Matches torchaudio.transforms.MFCC with the reference's melkwargs
    (src/model/extractor.py:38-46: n_fft, hop=win//2 default, n_mels=128
    default) followed by bilinear resize of the time axis to ``out_dim``
    (the 53->52 interpolation is always hit at the reference config,
    src/model/extractor.py:51-59).
    """

    def __init__(
        self,
        sample_rate: int,
        n_feature: int,
        out_dim: int,
        win_length: int,
        hop_length: int | None = None,
        n_fft: int | None = None,
    ):
        self.sample_rate = sample_rate
        self.n_mfcc = n_feature
        self.out_dim = out_dim
        self.win_length = win_length
        self.hop_length = hop_length if hop_length else win_length // 2
        self.n_fft = n_fft if n_fft else win_length

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = dsp.mfcc(
            x,
            sample_rate=self.sample_rate,
            n_mfcc=self.n_mfcc,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
        )  # (B, n_mfcc, T)
        feats = jnp.swapaxes(feats, -1, -2)  # (B, T, n_mfcc)
        if feats.shape[-2] != self.out_dim:
            feats = dsp.interp_bilinear(
                feats, self.out_dim, self.n_mfcc, align_corners=False
            )
        # the reference detaches extractor output (lightning_model.py:115)
        return jax.lax.stop_gradient(feats)


class Wav2VecExtractor:
    """wav2vec2-base hidden states, resized to (out_dim, n_feature).

    Faithful to the reference (src/model/extractor.py:63-96): resample
    orig_sr -> 16 kHz, processor zero-mean/unit-var normalization, stock
    wav2vec2 forward (frozen feature encoder), then — as the reference does —
    bilinear interpolation of the *(feature=768, time)* image down to
    (out_dim, n_feature).

    Requires wav2vec2 params; pass them via ``params`` (e.g. converted from
    the PyTorch checkpoint with
    ``audio2face_tpu.compat.torch_convert.convert_wav2vec2``) or a random
    init is drawn from ``seed`` for smoke/benchmark use.
    """

    def __init__(
        self,
        sample_rate: int,
        n_feature: int,
        out_dim: int,
        *args,
        params=None,
        seed: int = 0,
        dtype=None,
        **kwargs,
    ):
        from audio2face_tpu.models.wav2vec2 import Wav2Vec2Encoder, Wav2Vec2Config

        self.ori_sample_rate = sample_rate
        self.sample_rate = 16000
        self.out_dim = out_dim
        self.n_feature = n_feature
        self.config = Wav2Vec2Config()
        self.model = Wav2Vec2Encoder(self.config, dtype=dtype)
        if params is None:
            dummy = jnp.zeros((1, 16000), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = params

    def __call__(self, x: jnp.ndarray, params=None) -> jnp.ndarray:
        # callers tracing this under jit should pass ``params`` as a traced
        # argument: a closed-over parameter tree is baked into the compiled
        # program as ~380 MB of literals (remote-compile links reject it)
        params = self.params if params is None else params
        x = dsp.resample(x, self.ori_sample_rate, self.sample_rate)
        x = dsp.wav2vec2_zero_mean_unit_var(x)
        hidden = self.model.apply({"params": params}, x)  # (B, T, 768)
        feats = jnp.swapaxes(hidden, 1, 2)  # (B, 768, T) = the torch transpose
        if feats.shape[1] != self.out_dim:
            feats = dsp.interp_bilinear(
                feats, self.out_dim, self.n_feature, align_corners=False
            )
        return jax.lax.stop_gradient(feats)
