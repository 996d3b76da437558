"""Float64 torch transcription of ``torchaudio.transforms.MFCC``.

torchaudio itself is not installed in this environment, so the end-to-end
MFCC oracle is this independent transcription of its documented pipeline
(torchaudio 2.x, default arguments as instantiated by the reference at
/root/reference/src/model/extractor.py:38-46):

    Spectrogram(power=2, center=True, pad_mode="reflect", normalized=False)
    -> MelScale(n_mels=128, f_min=0, f_max=sr/2, htk, norm=None)
    -> AmplitudeToDB(power -> multiplier=10, amin=1e-10, top_db=None)
    -> create_dct(n_mfcc, n_mels, norm="ortho")

``tests/fixtures/mfcc_goldens.npz`` is generated from this mirror (float64)
by ``python -m tests.torchaudio_mirror``; on a machine with real torchaudio,
the same module cross-checks the goldens against
``torchaudio.transforms.MFCC`` and reports the max deviation.
"""

import math

import numpy as np
import torch

_F64 = torch.float64


def melscale_fbanks(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> torch.Tensor:
    """HTK-scale triangular filterbank, norm=None — (n_freqs, n_mels)."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs, dtype=_F64)
    m_min = 2595.0 * math.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * math.log10(1.0 + f_max / 700.0)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2, dtype=_F64)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)


def create_dct(n_mfcc: int, n_mels: int) -> torch.Tensor:
    """DCT-II matrix with ortho norm — (n_mels, n_mfcc)."""
    n = torch.arange(n_mels, dtype=_F64)
    k = torch.arange(n_mfcc, dtype=_F64)
    dct = torch.cos(math.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    dct[:, 0] *= 1.0 / math.sqrt(2.0)
    return dct * math.sqrt(2.0 / n_mels)


def mfcc_torch(
    x: np.ndarray,
    *,
    sample_rate: int,
    n_mfcc: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    n_mels: int = 128,
) -> np.ndarray:
    """(B, L) float waveform -> (B, n_mfcc, n_frames) float64."""
    xt = torch.as_tensor(np.asarray(x), dtype=_F64)
    window = torch.hann_window(win_length, dtype=_F64)
    spec = torch.stft(
        xt, n_fft, hop_length=hop_length, win_length=win_length,
        window=window, center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    ).abs() ** 2  # (B, n_freqs, T)
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, sample_rate / 2.0, n_mels, sample_rate)
    mel = torch.matmul(spec.transpose(-1, -2), fb)  # (B, T, n_mels)
    # AmplitudeToDB(power): 10*log10(clamp(x, 1e-10)); db_multiplier = 0
    mel_db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    mfcc = torch.matmul(mel_db, create_dct(n_mfcc, n_mels))  # (B, T, n_mfcc)
    return mfcc.transpose(-1, -2).numpy()


# golden configs: the reference's audio2mesh/voca extractor instantiations
# (src/config.py + src/model/extractor.py) plus the torchaudio defaults
GOLDEN_CONFIGS = {
    "audio2mesh": dict(sample_rate=22000, n_mfcc=32, n_fft=1024, win_length=440, hop_length=220),
    "voca": dict(sample_rate=22000, n_mfcc=16, n_fft=1024, win_length=790, hop_length=395),
    "defaults_440": dict(sample_rate=22000, n_mfcc=32, n_fft=440, win_length=440, hop_length=220),
}


def golden_inputs() -> np.ndarray:
    """Deterministic test signals: noise, a chirp, and speech-ish AM tone."""
    rng = np.random.default_rng(1234)
    n = 11440  # one reference fragment (0.52 s @ 22 kHz)
    t = np.arange(n) / 22000.0
    noise = (rng.normal(size=n) * 0.1).astype(np.float64)
    chirp = 0.5 * np.sin(2 * np.pi * (200 + 4000 * t) * t)
    am = (0.3 + 0.2 * np.sin(2 * np.pi * 3 * t)) * np.sin(2 * np.pi * 440 * t)
    return np.stack([noise, chirp, am + noise * 0.05])


def generate(path: str) -> None:
    out = {"inputs": golden_inputs()}
    for name, cfg in GOLDEN_CONFIGS.items():
        out[name] = mfcc_torch(out["inputs"], **cfg)
    np.savez_compressed(path, **out)


def crosscheck_real_torchaudio() -> None:  # pragma: no cover
    """Pin every torchaudio-derived oracle against the REAL op (run on the
    first machine that has the torchaudio wheel — docs/TORCHAUDIO_CHECK.md
    is the one-command runbook). Covers:

    - MFCC mirror (this module) vs torchaudio.transforms.MFCC — validates
      the committed mfcc_goldens.npz provenance;
    - the resample oracle (tests/test_dsp.torch_sinc_resample) AND the JAX
      ops/dsp.resample vs torchaudio.functional.resample — the wav2vec
      extractor's 22 kHz -> 16 kHz path (reference extractor.py:63-96);
    - the JAX mel helpers (data/utils.py) vs
      torchaudio.transforms.MelSpectrogram in both conventions the
      reference inspects (dataset/utils.py:8-45: slaney-norm/HTK and the
      MFCC-default unnormalized HTK).
    """
    import torchaudio

    failures = []

    def report(name, ref, ours, tol):
        dev = float(np.abs(np.asarray(ref) - np.asarray(ours)).max())
        status = "OK" if dev < tol else "FAIL"
        print(f"{status}  {name}: max dev {dev:.3e} (tol {tol:.0e})")
        if dev >= tol:
            failures.append(name)

    x = torch.as_tensor(golden_inputs(), dtype=torch.float32)
    for name, cfg in GOLDEN_CONFIGS.items():
        tfm = torchaudio.transforms.MFCC(
            sample_rate=cfg["sample_rate"], n_mfcc=cfg["n_mfcc"],
            melkwargs={
                "n_fft": cfg["n_fft"], "hop_length": cfg["hop_length"],
                "win_length": cfg["win_length"],
            },
        )
        report(f"mfcc[{name}] mirror", tfm(x).numpy(),
               mfcc_torch(x.numpy(), **cfg), 1e-2)

    # resample: transcription oracle and the shipped JAX op vs the real op
    from tests.test_dsp import torch_sinc_resample

    wav = golden_inputs().astype(np.float32)
    real = torchaudio.functional.resample(
        torch.as_tensor(wav, dtype=torch.float64), 22000, 16000
    ).numpy()
    report("resample 22k->16k transcription",
           real, torch_sinc_resample(wav, 22000, 16000), 1e-6)
    import jax.numpy as jnp

    from audio2face_tpu.ops import dsp

    report("resample 22k->16k ops/dsp.resample (f32)",
           real, np.asarray(dsp.resample(jnp.asarray(wav), 22000, 16000)), 1e-4)

    # melspec in both reference conventions (dataset/utils.py:8-45)
    from audio2face_tpu.data.utils import melspec_htk, melspec_htk_slaney

    mel_slaney = torchaudio.transforms.MelSpectrogram(
        sample_rate=22000, n_fft=1024, win_length=352, hop_length=176,
        center=True, pad=0, power=2.0, norm="slaney", n_mels=32,
        mel_scale="htk",
    )(x).numpy()
    report("melspec htk/slaney (data/utils vs torchaudio)",
           mel_slaney, melspec_htk_slaney(wav), 1e-4)
    mel_htk = torchaudio.transforms.MelSpectrogram(
        sample_rate=22000, n_fft=1024, win_length=352, hop_length=176,
        center=True, pad=0, power=2.0, norm=None, n_mels=32,
        mel_scale="htk",
    )(x).numpy()
    report("melspec htk/no-norm (data/utils vs torchaudio)",
           mel_htk, melspec_htk(wav), 1e-3)

    if failures:
        raise SystemExit(f"cross-check FAILED: {failures}")
    print("all torchaudio cross-checks passed")


if __name__ == "__main__":  # pragma: no cover
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(here, "fixtures"), exist_ok=True)
    path = os.path.join(here, "fixtures", "mfcc_goldens.npz")
    generate(path)
    print("wrote", path)
    try:
        crosscheck_real_torchaudio()
    except ImportError:
        print("torchaudio not installed — goldens come from the mirror only",
              file=sys.stderr)
