"""FramePredictor: raw-audio serving for the frame models.

The oracle is the training stack itself: host-side dataset fragments
(``batch_audio_fragments``, shift=0) through ``Audio2FaceExperiment.predict``
with a really-trained checkpoint — this pins the on-device fragmenter, the
in-graph feature extraction, AND the x100/÷100 unit convention at once.
"""

import numpy as np
import pytest

import jax

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.data.vocaset import FPS, batch_audio_fragments
from audio2face_tpu.serving import FramePredictor

SR = 22000
N_VERTS = 300


def _cfg(modelname: str, **over) -> ExpConfig:
    base = dict(
        batch_size=8, modelname=modelname, vertex_count=N_VERTS,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=SR,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-3,
    )
    if modelname == "voca":
        base.update(n_feature=16, out_dim=29, win_length=790)
    base.update(over)
    return ExpConfig(**base)


def _manual_frames(pred: FramePredictor, audio, one_hot_row, template):
    """Host-side oracle: dataset fragmenter + the predictor's own extractor
    and model, one whole-clip batch, no chunking/bucketing."""
    import jax.numpy as jnp

    t = len(audio) * FPS // SR
    frags = batch_audio_fragments(audio, np.arange(t), sample_rate=SR)
    feats = pred._features(jnp.asarray(frags))
    out = pred.model.apply(
        pred.variables, feats,
        jnp.broadcast_to(jnp.asarray(one_hot_row), (t, 12)),
        jnp.broadcast_to(jnp.asarray(template) * 100.0, (t, N_VERTS // 3, 3)),
        train=False,
    )
    return np.asarray(out, np.float32) / 100.0


@pytest.fixture(scope="module", params=["audio2mesh", "voca", "song2face"])
def predictor(request):
    return FramePredictor(
        _cfg(request.param), max_batch=4, frame_batch=16, bucket_seconds=0.5,
        seed=3,
    )


@pytest.mark.slow
def test_matches_host_fragmenter_oracle(predictor):
    """Ragged clip lengths spanning bucket AND frame-chunk boundaries each
    reproduce the host-fragmented whole-clip forward."""
    rng = np.random.default_rng(0)
    audios = [
        (rng.normal(size=int(s * SR)) * 0.1).astype(np.float32)
        for s in (0.31, 0.74, 0.52)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 4, 9]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    outs = predictor(audios, one_hot, template)
    assert len(outs) == 3
    for a, oh, got in zip(audios, one_hot, outs):
        want = _manual_frames(predictor, a, oh, template)
        assert got.shape == (len(a) * FPS // SR, N_VERTS // 3, 3)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    # shape discipline: one compiled program per audio bucket, not per clip
    assert len(predictor._fns) <= 2


@pytest.mark.slow
def test_from_checkpoint_matches_trainer_predict(tmp_path):
    """A framework-trained audio2mesh checkpoint served through
    FramePredictor reproduces Audio2FaceExperiment.predict (which divides
    by 100) on the same frames — real gradient steps first so the x100
    convention cannot hide in zero-init output layers."""
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    cfg = _cfg("audio2mesh", batch_size=4)
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"), tensorboard=False)

    rng = np.random.default_rng(1)
    clip = (rng.normal(size=int(0.3 * SR)) * 0.1).astype(np.float32)
    t = len(clip) * FPS // SR
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    frags = batch_audio_fragments(clip, np.arange(t), sample_rate=SR)
    batch = {
        "audio": frags.astype(np.float32),
        "verts": rng.normal(size=(t, N_VERTS // 3, 3)).astype(np.float32),
        "template_vert": np.broadcast_to(template, (t, N_VERTS // 3, 3)).copy(),
        "one_hot": np.broadcast_to(
            np.eye(12, dtype=np.float32)[3], (t, 12)
        ).copy(),
    }
    state = exp.init_state(batch)
    for i in range(2):
        state, _ = exp.train_step(state, batch, jax.random.PRNGKey(i))
    ckpt = exp.save_checkpoint(state, epoch=0)

    want, _ = exp.predict(state, batch)  # (t, V, 3) in data units
    want = np.asarray(want)

    pred = FramePredictor.from_checkpoint(
        ckpt, cfg, frame_batch=8, bucket_seconds=0.3
    )
    got = pred([clip], batch["one_hot"][:1], template)[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.abs(got - template[None]).max() > 1e-6  # scale bugs can't hide


def test_mesh_sharded_matches_single_device():
    """A (2, 1)-mesh FramePredictor (clip batch shard_mapped over chips,
    incl. a dummy padding row) reproduces the single-device predictor."""
    from audio2face_tpu.parallel.mesh import make_mesh

    cfg = _cfg("audio2mesh")
    solo = FramePredictor(cfg, max_batch=4, frame_batch=16, bucket_seconds=0.5)
    fleet = FramePredictor(
        cfg, variables=solo.variables, max_batch=4, frame_batch=16,
        bucket_seconds=0.5, mesh=make_mesh((2, 1), devices=jax.devices()[:2]),
    )
    rng = np.random.default_rng(2)
    audios = [
        (rng.normal(size=int(s * SR)) * 0.1).astype(np.float32)
        for s in (0.3, 0.45, 0.6)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[1, 5, 8]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = solo(audios, one_hot, template)
    got = fleet(audios, one_hot, template)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_batching_server_composes_with_frame_predictor():
    """BatchingServer's predictor contract (audios, one_hot, template,
    sample_rate=) is model-family agnostic: concurrent frame-model
    requests coalesce into one padded call and match direct prediction."""
    from audio2face_tpu.serving_queue import BatchingServer

    cfg = _cfg("audio2mesh")
    pred = FramePredictor(cfg, max_batch=4, frame_batch=16, bucket_seconds=0.5)
    rng = np.random.default_rng(6)
    audios = [
        (rng.normal(size=int(s * SR)) * 0.1).astype(np.float32)
        for s in (0.3, 0.45)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[2, 7]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = pred(audios, one_hot, template)

    server = BatchingServer(pred, max_wait_ms=50.0)
    try:
        futs = [
            server.submit(a, oh, template, sample_rate=SR)
            for a, oh in zip(audios, one_hot)
        ]
        for f, w in zip(futs, want):
            np.testing.assert_allclose(f.result(timeout=120), w, atol=1e-5)
    finally:
        server.close()


def test_resampling_and_validation():
    cfg = _cfg("voca")
    pred = FramePredictor(cfg, frame_batch=16, bucket_seconds=0.3)
    rng = np.random.default_rng(4)
    a16 = (rng.normal(size=8000) * 0.1).astype(np.float32)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32)
    out = pred([a16], np.eye(12, dtype=np.float32)[[0]], template,
               sample_rate=16000)
    assert out[0].shape[0] == (8000 * SR // 16000) * FPS // SR
    with pytest.raises(ValueError, match="one_hot"):
        pred([a16], np.eye(12, dtype=np.float32)[[0, 1]], template)
    with pytest.raises(ValueError, match="faceformer"):
        FramePredictor(_cfg("faceformer", split_frame=False, batch_size=1))


@pytest.mark.slow
def test_warmup_precompiles_all_buckets(predictor):
    """FramePredictor.warmup covers every (batch, bucket) program: serving
    any clip <= max_seconds afterwards adds no new compiled programs."""
    calls = predictor.warmup(1.0)
    assert calls > 0
    keys_after_warmup = set(predictor._fns)

    rng = np.random.default_rng(11)
    sr = predictor.sample_rate
    audios = [
        (rng.normal(size=int(s * sr)) * 0.1).astype(np.float32)
        for s in (0.2, 0.7, 1.0)
    ]
    one_hot = np.eye(predictor.n_onehot, dtype=np.float32)[[0, 1, 2]]
    template = rng.normal(size=(predictor.n_verts // 3, 3)).astype(np.float32)
    out = predictor(audios, one_hot, template)
    assert set(predictor._fns) == keys_after_warmup, (
        "serving compiled a new program after warmup"
    )
    for a, v in zip(audios, out):
        assert v.shape[0] == len(a) * 60 // sr
