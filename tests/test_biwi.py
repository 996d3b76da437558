"""BIWI-format data pipeline + end-to-end FaceFormer BIWI-mode training.

The reference has no BIWI loader (its BIWI support is two dead model-side
branches); this pins the full family: split routing by sentence number,
25 fps ClipBatch alignment, unseen-subject zero one-hot, and a fit/predict/
evaluate round trip through Audio2FaceExperiment with dataset="biwi"."""

import numpy as np
import pytest

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.data.biwi import (
    BIWI_FPS,
    BiwiDataModule,
    generate_synthetic_biwi,
)

N_VERTS = 120


@pytest.fixture(scope="module")
def biwi_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("biwi"))
    generate_synthetic_biwi(
        d, n_verts=N_VERTS, subjects=("F2", "M3", "F1"),
        sentences=(1, 2, 33, 37), seconds_per_sentence=0.8,
    )
    return d


@pytest.fixture(scope="module")
def dm(biwi_dir):
    m = BiwiDataModule(biwi_dir, batch_size=2, train_subjects=("F2", "M3"))
    m.setup()
    return m


def test_split_routing(dm):
    """Sentences 1-32 train, 33-36 val, 37-40 test — for every subject."""
    assert sorted(dm.train_dataset.datalist) == [
        ("F1", "01"), ("F1", "02"), ("F2", "01"), ("F2", "02"),
        ("M3", "01"), ("M3", "02"),
    ]
    assert {s for _, s in dm.val_dataset.datalist} == {"33"}
    assert {s for _, s in dm.test_dataset.datalist} == {"37"}


def test_clip_batch_25fps_alignment(dm):
    batch = next(iter(dm.val_batches()))
    s_bucket = batch["audio"].shape[1]
    # vertex bucket == the model's static frame clock at 25 fps
    assert s_bucket * BIWI_FPS // 16000 == batch["verts"].shape[1]
    np.testing.assert_array_equal(
        batch["audio_lengths"] * BIWI_FPS // 16000, batch["frame_lengths"]
    )
    assert batch["verts"].shape[2] == N_VERTS
    assert batch["template_vert"].shape == (batch["audio"].shape[0], N_VERTS, 3)


def test_one_hot_over_train_subjects(dm):
    """Identity one-hot spans train_subjects; unseen subjects (the standard
    unseen-condition eval) get the zero vector."""
    assert dm.train_dataset.one_hot("F2").tolist() == [1.0, 0.0]
    assert dm.train_dataset.one_hot("M3").tolist() == [0.0, 1.0]
    assert dm.train_dataset.one_hot("F1").tolist() == [0.0, 0.0]
    batch = dm.predict_batch("F1", "37")
    assert batch["one_hot"].shape == (1, 2)
    assert np.all(batch["one_hot"] == 0)


@pytest.mark.slow
def test_fit_predict_evaluate_biwi(biwi_dir, tmp_path):
    """Full loop: ExpConfig(dataset='biwi') -> FaceFormer(dataset='biwi',
    period=25) -> fit on the synthetic corpus -> predict + evaluate."""
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    cfg = ExpConfig(
        batch_size=2, modelname="faceformer", vertex_count=N_VERTS * 3,
        one_hot_size=2, feature_extractor=None, sample_rate=16000,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4, dataset="biwi",
    )
    dm = BiwiDataModule(biwi_dir, batch_size=2, train_subjects=("F2", "M3"))
    dm.setup()
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"), tensorboard=False)
    assert exp.model.dataset == "biwi" and exp.model.period == 25
    state, result = exp.fit(dm, max_epochs=1)
    assert np.isfinite(result.history[-1]["val/err"])

    pred, err = exp.predict(state, dm.predict_batch("F1", "37"))
    pred = np.asarray(pred)
    n_frames = 0.8 * BIWI_FPS  # 0.8 s at 25 fps
    assert pred.shape[1] >= n_frames and pred.shape[2] == N_VERTS

    out = exp.evaluate(state, dm)
    assert out["n_sentences"] == 3  # sentence 37 for each of the 3 subjects
    for k in ("lve", "fdd", "mve", "max_l2", "err"):
        assert np.isfinite(out[k]), (k, out)


def test_dataset_key_rejects_frame_models():
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    cfg = ExpConfig(
        batch_size=2, modelname="voca", vertex_count=N_VERTS * 3,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4, dataset="biwi",
    )
    with pytest.raises(ValueError, match="faceformer"):
        Audio2FaceExperiment(cfg, tensorboard=False)


def test_real_layout_ingestion_hand_rolled(tmp_path):
    """The loader consumes the DOCUMENTED on-disk schema, not whatever the
    synthetic generator happens to write: a hand-built corpus directory
    with a non-16 kHz wav (resample path) and a (T, V, 3)-shaped vertex
    track (the alternate accepted shape) must load, split, and batch."""
    import os
    import pickle

    import scipy.io.wavfile as wavfile

    from audio2face_tpu.data.biwi import SR, BiwiDataModule
    from audio2face_tpu.models.faceformer import frame_count

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "wav"))
    os.makedirs(os.path.join(d, "vertices_npy"))
    rng = np.random.default_rng(7)
    templates = {}
    v = 60
    for subject, sent in [("F2", 1), ("F2", 37), ("M6", 5)]:
        templates.setdefault(
            subject, rng.normal(0, 0.05, (v, 3)).astype(np.float32)
        )
        # 22.05 kHz source audio: the loader must resample to 16 kHz
        sr_in = 22050
        n_in = int(0.6 * sr_in)
        wav = (np.sin(np.arange(n_in) * 0.05) * 16000).astype(np.int16)
        wavfile.write(os.path.join(d, "wav", f"{subject}_{sent:02d}.wav"), sr_in, wav)
        n16 = int(round(n_in * SR / sr_in))
        t_frames = n16 * BIWI_FPS // SR
        # (T, V, 3) layout (vertices_npy also ships flattened (T, V*3))
        track = rng.normal(0, 0.01, (t_frames, v, 3)).astype(np.float32)
        np.save(os.path.join(d, "vertices_npy", f"{subject}_{sent:02d}.npy"), track)
    with open(os.path.join(d, "templates.pkl"), "wb") as f:
        pickle.dump(templates, f)

    m = BiwiDataModule(d, batch_size=2, train_subjects=("F2", "M6"))
    m.setup()
    # sentence routing: 1, 5 -> train; 37 -> test
    assert len(m.train_dataset) == 2
    assert len(m.test_dataset) == 1
    batches = list(m.train_batches(np.random.default_rng(0)))
    assert batches, "train split produced no batches"
    b = batches[0]
    n_frames = b["verts"].shape[1]
    assert b["verts"].shape[2:] == (v, 3)
    # the 25 fps contract: frame budget == frame_count of the audio bucket
    assert n_frames == frame_count(b["audio"].shape[1], BIWI_FPS)
    for i in range(len(b["audio"])):
        fl = int(b["frame_lengths"][i])
        al = int(b["audio_lengths"][i])
        assert fl <= n_frames and fl == frame_count(al, BIWI_FPS)
        assert np.isfinite(b["verts"][i, :fl]).all()
