"""Mel-spectrogram reference helpers (feature-parity checking utilities).

Parity with the reference's offline checking module
(src/dataset/utils.py:8-59), which compares torchaudio-vs-librosa mel
conventions and plots spectrograms. Here the two conventions are produced by
the same JAX DSP core with explicit flags, so the comparison is between the
slaney-normalized/HTK-scale variant the reference inspects and any other
parameterization. Not on the training path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audio2face_tpu.ops.dsp import amplitude_to_db, mel_spectrogram


def melspec_htk_slaney(
    audio,
    sr: int = 22000,
    n_mels: int = 32,
    n_fft: int = 1024,
    hop_length: int = 176,
    win_length: int = 176 * 2,
) -> np.ndarray:
    """The exact parameterization the reference inspects
    (dataset/utils.py:8-25: power=2, norm='slaney', mel_scale='htk')."""
    audio = jnp.asarray(np.asarray(audio, np.float32))
    out = mel_spectrogram(
        audio, sample_rate=sr, n_fft=n_fft, win_length=win_length,
        hop_length=hop_length, n_mels=n_mels, norm="slaney", mel_scale="htk",
    )
    return np.asarray(out)


def melspec_htk(
    audio,
    sr: int = 22000,
    n_mels: int = 32,
    n_fft: int = 1024,
    hop_length: int = 176,
    win_length: int = 176 * 2,
) -> np.ndarray:
    """Unnormalized HTK mel (the torchaudio-MFCC-default convention)."""
    audio = jnp.asarray(np.asarray(audio, np.float32))
    out = mel_spectrogram(
        audio, sample_rate=sr, n_fft=n_fft, win_length=win_length,
        hop_length=hop_length, n_mels=n_mels, norm=None, mel_scale="htk",
    )
    return np.asarray(out)


def power_to_db(spec: np.ndarray, top_db: float = 80.0) -> np.ndarray:
    """librosa.power_to_db(ref=max) equivalent for plotting."""
    spec = jnp.asarray(spec)
    db = amplitude_to_db(spec)
    db = db - jnp.max(db)
    return np.asarray(jnp.maximum(db, -top_db))


def plot_spectrogram(specgram, title=None, ylabel="freq_bin", ax=None):
    """Plot helper (dataset/utils.py:48-59). Requires matplotlib; gated so
    the core framework carries no plotting dependency."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise ImportError("plot_spectrogram requires matplotlib") from e
    if ax is None:
        _, ax = plt.subplots(1, 1)
    if title is not None:
        ax.set_title(title)
    ax.set_ylabel(ylabel)
    ax.imshow(
        power_to_db(np.asarray(specgram)),
        origin="lower",
        aspect="auto",
        interpolation="nearest",
    )
    return ax
