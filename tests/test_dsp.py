import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fft
import torch

from audio2face_tpu.ops import dsp


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        dsp.hann_window(440), torch.hann_window(440).numpy(), atol=1e-6
    )


def test_spectrogram_matches_torch_stft():
    """STFT path vs torch.stft with torchaudio.Spectrogram's conventions
    (center=True, reflect pad, Hann(win) padded to n_fft, power=2)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 11440)).astype(np.float32)
    n_fft, win, hop = 1024, 440, 220

    ours = dsp.spectrogram(jnp.asarray(x), n_fft=n_fft, win_length=win, hop_length=hop)

    window = torch.hann_window(win)
    t = torch.stft(
        torch.as_tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    t_power = (t.abs() ** 2).numpy()
    assert ours.shape == t_power.shape  # (2, 513, 53)
    np.testing.assert_allclose(np.asarray(ours), t_power, rtol=1e-3, atol=1e-3)


def test_frame_count_matches_reference_window():
    """0.52 s @ 22 kHz with hop 220 yields 53 frames — the reference's
    always-hit 53->52 interpolation (src/model/extractor.py:51-59)."""
    x = jnp.zeros((1, int(22000 * 0.52)))
    spec = dsp.spectrogram(x, n_fft=1024, win_length=440, hop_length=220)
    assert spec.shape == (1, 513, 53)


def test_dct_matrix_matches_scipy():
    ours = dsp.dct_matrix(32, 128, norm="ortho")  # (128, 32)
    # DCT-II of a basis vector: scipy dct applied to identity
    eye = np.eye(128)
    ref = scipy.fft.dct(eye, type=2, norm="ortho", axis=1)[:, :32]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(513, 0.0, 11000.0, 128, 22000, norm=None, mel_scale="htk")
    assert fb.shape == (513, 128)
    assert (fb >= 0).all()
    # every filter has positive mass and unit peak-ish triangular shape
    assert (fb.sum(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # slaney norm scales each filter by 2/bandwidth
    fb_s = dsp.mel_filterbank(513, 0.0, 11000.0, 128, 22000, norm="slaney", mel_scale="htk")
    ratio = fb_s.sum(axis=0) / fb.sum(axis=0)
    assert (ratio > 0).all() and (np.diff(ratio) < 0).all()  # narrower filters get larger gain


def test_htk_mel_roundtrip():
    f = np.array([0.0, 440.0, 1000.0, 4000.0, 11000.0])
    np.testing.assert_allclose(dsp._mel_to_hz(dsp._hz_to_mel(f)), f, rtol=1e-10)
    # HTK formula spot check
    np.testing.assert_allclose(dsp._hz_to_mel(700.0), 2595.0 * math.log10(2.0), rtol=1e-12)


def test_amplitude_to_db():
    x = jnp.asarray([1.0, 0.1, 1e-12])
    db = dsp.amplitude_to_db(x)
    np.testing.assert_allclose(np.asarray(db), [0.0, -10.0, -100.0], atol=1e-4)


@pytest.mark.parametrize("align_corners", [True, False])
def test_interp_linear_matches_torch(align_corners):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 53)).astype(np.float32)
    ours = dsp.interp_linear(jnp.asarray(x), 52, axis=-1, align_corners=align_corners)
    t = torch.nn.functional.interpolate(
        torch.as_tensor(x), size=52, mode="linear", align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), t, rtol=1e-4, atol=1e-5)


def test_interp_bilinear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 1, 53, 32)).astype(np.float32)
    ours = dsp.interp_bilinear(jnp.asarray(x), 52, 32, align_corners=False)
    t = torch.nn.functional.interpolate(
        torch.as_tensor(x), size=(52, 32), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), t, rtol=1e-4, atol=1e-5)


def torch_sinc_resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Independent torch transcription of torchaudio's documented
    sinc_interp_hann resampler, used as the parity oracle."""
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    lowpass_filter_width, rolloff = 6, 0.99
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = torch.arange(-width, width + orig, dtype=torch.float64)[None] / orig
    t = (-torch.arange(new, dtype=torch.float64)[:, None] / new + idx) * base_freq
    t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)
    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t = t * math.pi
    scale = base_freq / orig
    kernel = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64), t.sin() / t)
    kernel = kernel * window * scale
    xt = torch.as_tensor(x, dtype=torch.float64)[:, None]
    length = xt.shape[-1]
    xt = torch.nn.functional.pad(xt, (width, width + orig))
    y = torch.nn.functional.conv1d(xt, kernel[:, None], stride=orig)
    y = y.transpose(1, 2).reshape(x.shape[0], -1)
    target = math.ceil(new * length / orig)
    return y[..., :target].numpy()


def test_resample_matches_torch_transcription():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 22000)).astype(np.float32)
    ours = np.asarray(dsp.resample(jnp.asarray(x), 22000, 16000))
    ref = torch_sinc_resample(x, 22000, 16000)
    assert ours.shape == ref.shape == (2, 16000)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_resample_preserves_sine():
    sr_in, sr_out = 22000, 16000
    t_in = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t_in).astype(np.float32)[None]
    y = np.asarray(dsp.resample(jnp.asarray(x), sr_in, sr_out))[0]
    t_out = np.arange(len(y)) / sr_out
    expected = np.sin(2 * np.pi * 440.0 * t_out)
    # ignore filter edge transients
    sl = slice(200, -200)
    np.testing.assert_allclose(y[sl], expected[sl], atol=5e-3)


def test_mfcc_shapes_and_finiteness():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 11440)).astype(np.float32) * 0.1
    out = dsp.mfcc(
        jnp.asarray(x), sample_rate=22000, n_mfcc=32, n_fft=1024,
        win_length=440, hop_length=220,
    )
    assert out.shape == (3, 32, 53)
    assert np.isfinite(np.asarray(out)).all()


def test_mfcc_jit_and_grad():
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 11440)).astype(np.float32))

    @jax.jit
    def f(x):
        return jnp.sum(
            dsp.mfcc(x, sample_rate=22000, n_mfcc=32, n_fft=1024, win_length=440, hop_length=220)
        )

    g = jax.grad(lambda x: f(x))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_batched_audio_fragments_matches_host_fragmenter():
    """On-device gather fragmenter vs the reference host-loop semantics
    (src/dataset/vocaset.py:408-430) at shift=0."""
    rng = np.random.default_rng(6)
    sr, fps, length = 22000, 60, 0.52
    audio = rng.normal(size=(sr * 2,)).astype(np.float32)
    n_pad = int(sr * length / 2)

    def host_fragment(idx):
        pad_audio = np.concatenate([np.zeros(n_pad, np.float32), audio, np.zeros(2 * n_pad, np.float32)])
        start = idx * sr // fps
        return pad_audio[start : start + 2 * n_pad]

    frame_idx = jnp.asarray([0, 1, 17, 119])
    ours = np.asarray(
        dsp.batched_audio_fragments(
            jnp.asarray(audio), frame_idx, fps=fps, sample_rate=sr, length=length
        )
    )
    for i, idx in enumerate([0, 1, 17, 119]):
        np.testing.assert_allclose(ours[i], host_fragment(idx), atol=1e-7)


def test_wav2vec2_normalization():
    rng = np.random.default_rng(7)
    x = rng.normal(loc=0.3, scale=2.0, size=(2, 16000)).astype(np.float32)
    y = np.asarray(dsp.wav2vec2_zero_mean_unit_var(jnp.asarray(x)))
    np.testing.assert_allclose(y.mean(axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.var(axis=-1), 1.0, atol=1e-3)


def test_mfcc_end_to_end_matches_torchaudio_goldens():
    """Full dsp.mfcc pipeline vs committed goldens from the float64 torch
    transcription of torchaudio.transforms.MFCC (tests/torchaudio_mirror.py)
    — closes the gap the per-component tests (stft/dct/mel) leave: the
    composition itself is pinned, not inferred.

    Reference: torchaudio MFCC at src/model/extractor.py:38-46.
    """
    import os

    from tests.torchaudio_mirror import GOLDEN_CONFIGS, golden_inputs, mfcc_torch

    path = os.path.join(os.path.dirname(__file__), "fixtures", "mfcc_goldens.npz")
    goldens = np.load(path)
    x32 = goldens["inputs"].astype(np.float32)
    np.testing.assert_allclose(goldens["inputs"], golden_inputs(), atol=0)

    for name, cfg in GOLDEN_CONFIGS.items():
        want = goldens[name]
        # the committed golden must be reproducible from the live mirror
        np.testing.assert_allclose(
            mfcc_torch(goldens["inputs"], **cfg), want, atol=1e-9
        )
        got = np.asarray(
            dsp.mfcc(
                jnp.asarray(x32),
                sample_rate=cfg["sample_rate"], n_mfcc=cfg["n_mfcc"],
                n_fft=cfg["n_fft"], win_length=cfg["win_length"],
                hop_length=cfg["hop_length"],
            )
        )
        assert got.shape == want.shape, (name, got.shape, want.shape)
        scale = np.abs(want).max()
        err = np.abs(got - want).max()
        assert err < 2e-3 * scale, (name, err, scale)


def test_mfcc_extractor_end_to_end_matches_torch():
    """MFCCExtractor (mfcc + bilinear resize to out_dim) vs the torch mirror
    + F.interpolate — the exact reference extractor contract
    (src/model/extractor.py:48-59)."""
    import torch

    from audio2face_tpu.models.extractor import MFCCExtractor
    from tests.torchaudio_mirror import mfcc_torch

    rng = np.random.default_rng(5)
    x = (rng.normal(size=(2, 11440)) * 0.2).astype(np.float32)
    fe = MFCCExtractor(22000, 32, 52, 440, None, 1024)
    got = np.asarray(fe(jnp.asarray(x)))  # (B, 52, 32)

    ref = mfcc_torch(
        x, sample_rate=22000, n_mfcc=32, n_fft=1024,
        win_length=440, hop_length=220,
    )  # (B, 32, T)
    reft = torch.as_tensor(ref.swapaxes(-1, -2), dtype=torch.float32)  # (B, T, 32)
    want = torch.nn.functional.interpolate(
        reft.unsqueeze(1), size=(52, 32), mode="bilinear", align_corners=False
    ).squeeze(1).numpy()
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 2e-3 * scale
