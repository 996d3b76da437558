"""Audio DSP primitives in pure JAX, fused into the jit'd model graph.

TPU-native replacement for the reference's native-backed audio stack:

- ``torchaudio.transforms.MFCC`` (reference usage: src/model/extractor.py:38-46)
  = STFT (center/reflect, Hann) -> power -> HTK mel filterbank -> power-dB ->
  DCT-II. Conventions follow torchaudio defaults exactly (n_mels=128,
  f_min=0, f_max=sr/2, mel_scale="htk", norm=None, power=2.0, periodic Hann
  padded to n_fft, ``AmplitudeToDB("power", top_db=None)``, DCT norm="ortho").
- ``torchaudio.functional.resample`` (src/model/extractor.py:85,
  src/dataset/vocaset.py:280): windowed-sinc polyphase resampler with the
  same defaults (lowpass_filter_width=6, rolloff=0.99, Hann window).
- ``F.interpolate`` bilinear/linear paths (src/model/extractor.py:51-59,
  src/model/wav2vec.py:76-84).

Everything here is shape-static and jit-friendly; filterbanks and windows are
precomputed as numpy constants that XLA folds into the compiled graph, so the
whole audio front-end runs on-chip (MXU matmuls for mel/DCT projections).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows and filterbanks (host-side constant construction)
# ---------------------------------------------------------------------------


def hann_window(win_length: int, *, periodic: bool = True) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    denom = win_length if periodic else win_length - 1
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / denom))).astype(np.float32)


def _hz_to_mel(freq, mel_scale: str = "htk"):
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(mels, mel_scale: str = "htk"):
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> np.ndarray:
    """Triangular mel filterbank, (n_freqs, n_mels).

    Same construction as torchaudio ``melscale_fbanks``: FFT bin centres
    linspace(0, sr/2, n_freqs); n_mels+2 points equally spaced in mel space;
    optional slaney area normalization.
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def dct_matrix(n_mfcc: int, n_mels: int, norm: str | None = "ortho") -> np.ndarray:
    """DCT-II basis, (n_mels, n_mfcc), matching torchaudio ``create_dct``."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    if norm is None:
        dct = dct * 2.0
    else:
        if norm != "ortho":
            raise ValueError(f"norm must be None or 'ortho', got {norm!r}")
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct = dct * math.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)


# ---------------------------------------------------------------------------
# Spectrogram / MFCC (jit-friendly)
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int, n_frames: int) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, frame_length) with static shapes.

    Gather-based framing: XLA lowers this to an efficient strided gather and
    fuses the windowing multiply into it.
    """
    starts = np.arange(n_frames) * hop
    idx = starts[:, None] + np.arange(frame_length)[None, :]  # (n_frames, frame_length)
    return x[..., idx]


def spectrogram(
    waveform: jnp.ndarray,
    *,
    n_fft: int,
    win_length: int,
    hop_length: int,
    power: float = 2.0,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Power spectrogram, (..., n_freqs, n_frames), torch.stft conventions.

    Hann window of ``win_length`` zero-padded symmetrically to ``n_fft``;
    ``center=True`` reflect-pads n_fft//2 on both sides so
    n_frames = 1 + L // hop_length.
    """
    window = hann_window(win_length)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = np.pad(window, (left, n_fft - win_length - left))
    window = jnp.asarray(window)

    x = waveform.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)

    length = x.shape[-1]
    n_frames = (length - n_fft) // hop_length + 1
    frames = frame_signal(x, n_fft, hop_length, n_frames)  # (..., n_frames, n_fft)
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (..., n_frames, n_freqs)
    spec = jnp.abs(spec)
    if power != 1.0:
        spec = spec**power
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freqs, n_frames)


def amplitude_to_db(
    x: jnp.ndarray,
    *,
    multiplier: float = 10.0,
    amin: float = 1e-10,
    db_multiplier: float = 0.0,
    top_db: float | None = None,
) -> jnp.ndarray:
    """Power/amplitude to decibels, torchaudio ``AmplitudeToDB`` semantics."""
    x_db = multiplier * jnp.log10(jnp.maximum(x, amin)) - multiplier * db_multiplier
    if top_db is not None:
        x_db = jnp.maximum(x_db, jnp.max(x_db) - top_db)
    return x_db


def mel_spectrogram(
    waveform: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 2.0,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> jnp.ndarray:
    """(..., L) -> (..., n_mels, n_frames), torchaudio MelSpectrogram defaults."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    spec = spectrogram(
        waveform, n_fft=n_fft, win_length=win_length, hop_length=hop_length, power=power
    )
    fb = jnp.asarray(
        mel_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate, norm, mel_scale)
    )
    # (..., n_freqs, T) x (n_freqs, n_mels) -> (..., n_mels, T); MXU matmul
    mel = jnp.einsum("...ft,fm->...mt", spec, fb)
    return mel


def mfcc(
    waveform: jnp.ndarray,
    *,
    sample_rate: int,
    n_mfcc: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int = 128,
    log_mels: bool = False,
) -> jnp.ndarray:
    """(..., L) -> (..., n_mfcc, n_frames), torchaudio ``transforms.MFCC``."""
    mel = mel_spectrogram(
        waveform,
        sample_rate=sample_rate,
        n_fft=n_fft,
        win_length=win_length,
        hop_length=hop_length,
        n_mels=n_mels,
    )
    if log_mels:
        mel = jnp.log(mel + 1e-6)
    else:
        mel = amplitude_to_db(mel)
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels, norm="ortho"))
    return jnp.einsum("...mt,mk->...kt", mel, dct)


# ---------------------------------------------------------------------------
# Interpolation (F.interpolate parity)
# ---------------------------------------------------------------------------


def _interp_weights(in_size: int, out_size: int, align_corners: bool):
    """Source coordinates + gather indices/weights for 1-D linear interp."""
    if out_size == 1:
        src = np.zeros(1)
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def interp_linear(x: jnp.ndarray, out_size: int, *, axis: int, align_corners: bool) -> jnp.ndarray:
    """Linear interpolation along ``axis`` to ``out_size`` (static shapes)."""
    in_size = x.shape[axis]
    if in_size == out_size and align_corners:
        return x
    lo, hi, w_hi = _interp_weights(in_size, out_size, align_corners)
    # (a dense-matmul formulation of the 2-banded interp matrix was tried
    # for the bf16 path and measured SLOWER than the gather — 3.0 ms vs
    # 1.7 ms at (8, 2999->3600, 512) — XLA handles this gather acceptably)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w_hi).reshape(shape)
    return x_lo * (1.0 - w) + x_hi * w


def interp_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, *, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear interpolation of the last two axes (F.interpolate parity)."""
    x = interp_linear(x, out_h, axis=-2, align_corners=align_corners)
    return interp_linear(x, out_w, axis=-1, align_corners=align_corners)


def linear_interpolation_fps(
    features: jnp.ndarray, output_len: int
) -> jnp.ndarray:
    """Resample the time axis of (B, T, C) features to ``output_len`` frames
    with align_corners=True linear interp — the reference's mid-graph wav2vec2
    fps adapter (src/model/wav2vec.py:76-84, applied at :125-128)."""
    return interp_linear(features, output_len, axis=1, align_corners=True)


def interp_linear_per_item(
    x: jnp.ndarray,
    out_size: int,
    in_lengths: jnp.ndarray,
    out_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Per-item align_corners=True linear interp over the *valid prefix*.

    ``x``: (B, T, C) padded; item b's first ``in_lengths[b]`` steps are
    resampled onto its first ``out_lengths[b]`` output frames (frames beyond
    that clamp to the last valid step and should be masked downstream).
    Makes padded-batch decoding agree with per-item unpadded decoding —
    a capability the batch-1 reference lacks. Static shapes, dynamic values.
    """
    b, t, _ = x.shape
    f = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # (1, out)
    scale = (in_lengths[:, None].astype(jnp.float32) - 1.0) / jnp.maximum(
        out_lengths[:, None].astype(jnp.float32) - 1.0, 1.0
    )
    src = jnp.clip(f * scale, 0.0, in_lengths[:, None].astype(jnp.float32) - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_lengths[:, None] - 1)
    w = (src - lo)[..., None]
    x_lo = jnp.take_along_axis(x, lo[..., None], axis=1)
    x_hi = jnp.take_along_axis(x, hi[..., None], axis=1)
    return x_lo * (1.0 - w) + x_hi * w


# ---------------------------------------------------------------------------
# Polyphase resampling (torchaudio.functional.resample parity)
# ---------------------------------------------------------------------------


def _resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Windowed-sinc polyphase kernel, (new_freq, 1, kernel_width).

    Construction mirrors torchaudio's ``_get_sinc_resample_kernel`` with the
    default Hann-windowed sinc interpolation.
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq

    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * scale
    return kernel[:, None, :].astype(np.float32), width


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    *,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """(..., L) -> (..., ceil(L * new/orig)); torchaudio default resampler."""
    if orig_freq == new_freq:
        return waveform
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    kernel, width = _resample_kernel(orig, new, lowpass_filter_width, rolloff)

    batch_shape = waveform.shape[:-1]
    length = waveform.shape[-1]
    x = waveform.reshape(-1, 1, length).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel),
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, new, T')
    y = jnp.swapaxes(y, 1, 2).reshape(*batch_shape, -1)
    target_length = math.ceil(new * length / orig)
    return y[..., :target_length]


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def normalize_int16(audio: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM -> float32 in [-1, 1) (reference: src/dataset/vocaset.py:64-69)."""
    return (audio / 32768.0).astype(jnp.float32)


def wav2vec2_zero_mean_unit_var(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """The Wav2Vec2Processor's normalization for the base-960h checkpoint:
    per-utterance zero mean / unit variance ((x - mu) / sqrt(var + 1e-7));
    the reference round-trips through the HF processor on host
    (src/model/faceformer.py:142-144) — here it stays on-chip."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-7)


@partial(jax.jit, static_argnames=("fps", "sample_rate", "length", "max_shift"))
def batched_audio_fragments(
    audio: jnp.ndarray,
    frame_idx: jnp.ndarray,
    *,
    fps: int = 60,
    sample_rate: int = 22000,
    length: float = 0.52,
    shift: jnp.ndarray | None = None,
    max_shift: int = 500,
) -> jnp.ndarray:
    """On-device equivalent of the host fragmenter for whole-clip batching:
    gathers the ``length``-second window centered at each frame time
    (reference host loop: src/dataset/vocaset.py:408-430). ``audio`` is a
    zero-padded (L,) clip; ``frame_idx`` is (N,) frame indices."""
    n_pad = int(sample_rate * length / 2)
    window = 2 * n_pad
    pad_lo = n_pad + max_shift
    padded = jnp.pad(audio, (pad_lo, window))
    starts = frame_idx * sample_rate // fps + max_shift
    if shift is not None:
        starts = starts - shift
    idx = starts[:, None] + jnp.arange(window)[None, :]
    return padded[idx]
