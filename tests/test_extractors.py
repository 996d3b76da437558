import jax.numpy as jnp
import numpy as np
import pytest

from audio2face_tpu.models.extractor import MFCCExtractor, Wav2VecExtractor


def test_mfcc_extractor_contract():
    """(B, L) -> (B, out_dim, n_mfcc), reference contract
    (src/model/extractor.py:10-60) with the always-hit 53->52 interp."""
    fe = MFCCExtractor(sample_rate=22000, n_feature=32, out_dim=52, win_length=440, hop_length=None, n_fft=1024)
    assert fe.hop_length == 220  # default win//2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 11440)).astype(np.float32) * 0.1)
    out = fe(x)
    assert out.shape == (3, 52, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_mfcc_extractor_voca_config():
    """VOCA spec: n_mfcc=16, out_dim=29, win 790 (reference voca.py:11-17)."""
    fe = MFCCExtractor(sample_rate=22000, n_feature=16, out_dim=29, win_length=790, hop_length=None, n_fft=1024)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 11440)).astype(np.float32) * 0.1)
    out = fe(x)
    assert out.shape == (2, 29, 16)


@pytest.mark.slow
def test_wav2vec_extractor_contract():
    """(B, L@22k) -> (B, out_dim, n_feature): resample -> norm -> wav2vec2 ->
    bilinear (768, T) -> (52, 32) (reference src/model/extractor.py:63-96)."""
    fe = Wav2VecExtractor(sample_rate=22000, n_feature=32, out_dim=52)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 11000)).astype(np.float32) * 0.1)
    out = fe(x)
    assert out.shape == (2, 52, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_melspec_helpers():
    from audio2face_tpu.data.utils import melspec_htk, melspec_htk_slaney, power_to_db

    x = np.random.default_rng(3).normal(size=(11440,)).astype(np.float32) * 0.1
    m1 = melspec_htk_slaney(x)
    m2 = melspec_htk(x)
    assert m1.shape == m2.shape == (32, 11440 // 176 + 1)
    assert (m1 >= 0).all() and (m2 >= 0).all()
    # slaney norm scales filters; the two conventions differ
    assert not np.allclose(m1, m2)
    db = power_to_db(m2)
    assert db.max() <= 0.0 and db.min() >= -80.0
