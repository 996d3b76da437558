import numpy as np
import pytest

from audio2face_tpu.serving import FaceFormerPredictor


@pytest.fixture(scope="module")
def predictor():
    return FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=4, bucket_seconds=0.5, decode_impl="scan"
    )


def test_variable_length_batch(predictor):
    rng = np.random.default_rng(0)
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.3, 0.7, 0.45)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 4, 9]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    out = predictor(audios, one_hot, template)
    assert len(out) == 3
    for a, v in zip(audios, out):
        assert v.shape == (len(a) * 60 // 16000, 100, 3)
    # only two bucket/batch-shape programs should have compiled (0.5s and 1.0s)
    assert len(predictor._fns) <= 2


def test_batch_matches_solo(predictor):
    rng = np.random.default_rng(1)
    a = (rng.normal(size=8000) * 0.1).astype(np.float32)
    one_hot = np.eye(12, dtype=np.float32)[[2]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    solo = predictor([a], one_hot, template)[0]

    batch = predictor(
        [a, (rng.normal(size=4000) * 0.1).astype(np.float32)],
        np.eye(12, dtype=np.float32)[[2, 7]],
        template,
    )
    np.testing.assert_allclose(batch[0], solo, atol=2e-3)


def test_resampling_path(predictor):
    rng = np.random.default_rng(2)
    a22 = (rng.normal(size=11000) * 0.1).astype(np.float32)
    out = predictor([a22], np.eye(12, dtype=np.float32)[[0]],
                    rng.normal(size=(100, 3)).astype(np.float32), sample_rate=22000)
    assert out[0].shape[0] == (11000 * 16000 // 22000) * 60 // 16000


def test_one_hot_batch_mismatch(predictor):
    with pytest.raises(ValueError, match="one_hot"):
        predictor([np.zeros(8000, np.float32)], np.eye(12, dtype=np.float32)[[0, 1]],
                  np.zeros((100, 3), np.float32))
