import numpy as np
import pytest

from audio2face_tpu.data.synthetic import generate_synthetic_vocaset
from audio2face_tpu.data.vocaset import (
    ALL_SUBJECTS,
    TEST_SUBJECTS,
    TRAINING_SUBJECTS,
    VALIDATION_SUBJECTS,
    ClipVocaSet,
    DataSplitRecorder,
    VocaDataModule,
    batch_audio_fragments,
    get_audio_fragment,
    get_human_id_one_hot,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocaset")
    return generate_synthetic_vocaset(str(d), n_verts=50, sentences_per_subject=1, seconds_per_sentence=0.6)


def test_subject_lists_match_reference():
    """The fixed 12-subject split (reference: vocaset.py:31-47)."""
    assert len(TRAINING_SUBJECTS) == 8
    assert len(VALIDATION_SUBJECTS) == 2
    assert len(TEST_SUBJECTS) == 2
    assert len(ALL_SUBJECTS) == 12
    assert TRAINING_SUBJECTS[0] == "FaceTalk_170728_03272_TA"
    assert VALIDATION_SUBJECTS[1] == "FaceTalk_170908_03277_TA"
    oh = get_human_id_one_hot("FaceTalk_170908_03277_TA")
    assert oh[9] == 1.0 and oh.sum() == 1.0


def test_fragmenter_matches_reference_semantics():
    rng = np.random.default_rng(0)
    audio = rng.integers(-1000, 1000, 44000).astype(np.int16)
    for idx, shift in [(0, 0), (5, 0), (30, -200), (60, 500)]:
        ref = get_audio_fragment(audio, idx, sample_rate=22000, shift=shift)
        vec = batch_audio_fragments(
            audio, np.asarray([idx]), sample_rate=22000, shifts=np.asarray([shift])
        )[0]
        np.testing.assert_array_equal(ref, vec)
        assert len(ref) == 11440  # 0.52 s @ 22 kHz


def test_split_csvs_and_routing(data_dir):
    ds = ClipVocaSet(data_dir, phase="train")
    assert DataSplitRecorder.exists(data_dir)
    rec = DataSplitRecorder.load(data_dir)
    for h, s, _, _ in rec.train_list:
        assert h in TRAINING_SUBJECTS
    for h, s, _, _ in rec.val_list:
        assert h in VALIDATION_SUBJECTS and int(s[-2:]) >= 21
    # test bucket catches test subjects AND out-of-range sentences
    test_subjects = {h for h, *_ in rec.test_list}
    assert set(TEST_SUBJECTS) <= test_subjects


def test_frame_batch_shapes(data_dir):
    ds = ClipVocaSet(data_dir, phase="train")
    batch = ds.gather_frames(list(range(8)))
    assert batch.audio.shape == (8, 11440)
    assert batch.verts.shape == (8, 50, 3)
    assert batch.template_vert.shape == (8, 50, 3)
    assert batch.one_hot.shape == (8, 12)
    assert batch.audio.dtype == np.float32
    assert np.abs(batch.audio).max() <= 1.0  # int16 normalized


def test_clip_batch_padding(data_dir):
    ds = ClipVocaSet(data_dir, phase="train", split_frame=False)
    batch = ds.gather_clips(ds.datalist[:2])
    b, s = batch.audio.shape
    assert b == 2 and s % 1600 == 0
    assert batch.verts.shape[0] == 2 and batch.verts.shape[1] % 6 == 0
    # frame mask consistency: audio_len * 60 // 16000 == frame_lengths
    np.testing.assert_array_equal(
        batch.audio_lengths * 60 // 16000, batch.frame_lengths
    )
    # padded regions are zero
    for i in range(2):
        assert np.all(batch.audio[i, batch.audio_lengths[i]:] == 0)
        assert np.all(batch.verts[i, batch.frame_lengths[i]:] == 0)


def test_datamodule_iterators(data_dir):
    dm = VocaDataModule(data_dir, batch_size=16, split_frame=True)
    dm.setup()
    rng = np.random.default_rng(0)
    batches = list(dm.train_batches(rng))
    assert all(b["audio"].shape[0] == 16 for b in batches)  # drop_last
    # shuffling changes order between epochs
    b1 = next(iter(dm.train_batches(np.random.default_rng(1))))
    b2 = next(iter(dm.train_batches(np.random.default_rng(2))))
    assert not np.allclose(b1["verts"], b2["verts"])
    # val deterministic
    v1 = next(iter(dm.val_batches()))
    v2 = next(iter(dm.val_batches()))
    np.testing.assert_array_equal(v1["verts"], v2["verts"])


def test_predict_batch_frame_order(data_dir):
    dm = VocaDataModule(data_dir, batch_size=8, split_frame=True)
    dm.setup()
    subj = TEST_SUBJECTS[0]
    batch = dm.predict_batch(subj, "sentence01")
    assert batch["audio"].shape[0] > 0
    assert (batch["one_hot"][:, ALL_SUBJECTS.index(subj)] == 1).all()


def test_clip_bucket_matches_model_frame_clock(tmp_path):
    """Regression: the vertex bucket must equal frame_count(audio_bucket) —
    clips a few samples past the 1600-sample grain used to produce a 54-frame
    model output against a 48-frame vertex bucket (loss reshape crash).
    17,601 samples @22 kHz resample to 12,801 @16 kHz, one past the grain."""
    from audio2face_tpu.data.synthetic import generate_synthetic_vocaset

    d = str(tmp_path / "oddlen")
    generate_synthetic_vocaset(
        d, n_verts=60, sentences_per_subject=1, seconds_per_sentence=17601 / 22000
    )
    dm = VocaDataModule(d, batch_size=2, split_frame=False)
    dm.setup()
    batch = next(iter(dm.train_batches(np.random.default_rng(0))))
    s_bucket = batch["audio"].shape[1]
    assert s_bucket * 60 // 16000 == batch["verts"].shape[1]
    # per-item masks still consistent with the model's frame clock
    np.testing.assert_array_equal(
        batch["audio_lengths"] * 60 // 16000, batch["frame_lengths"]
    )
