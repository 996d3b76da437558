"""FSDP (ZeRO-3) sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio2face_tpu.parallel.fsdp import fsdp_spec, shard_state_fsdp
from audio2face_tpu.parallel.mesh import make_mesh


def test_fsdp_spec_rules():
    # largest divisible dim wins
    assert fsdp_spec((768, 3072), 8) == P(None, "data")
    assert fsdp_spec((3072, 768), 8) == P("data")
    # composes around a taken tensor-parallel dim
    assert fsdp_spec((768, 3072), 8, base=P(None, "model")) == P("data", "model")
    assert fsdp_spec((768, 3072), 8, base=P("model", None)) == P("model", "data")
    # odd dims are skipped (15069 % 8 != 0 -> falls to dim 0)
    assert fsdp_spec((128, 15069), 8) == P("data")
    # too small -> replicated / base unchanged
    assert fsdp_spec((768,), 8) == P()
    assert fsdp_spec((48,), 8, base=P("model")) == P("model")
    # nothing divides -> base unchanged
    assert fsdp_spec((15069, 3), 8, min_elems=1) == P()
    # single data shard -> no-op
    assert fsdp_spec((768, 3072), 1) == P()


def test_shard_state_fsdp_places_leaves():
    mesh = make_mesh((4, 2))
    tree = {
        "audio_encoder": {
            "layer0": {
                "intermediate_dense": {
                    "kernel": np.zeros((768, 3072), np.float32),
                    "bias": np.zeros((3072,), np.float32),
                },
                "out_proj": {"kernel": np.zeros((768, 768), np.float32)},
            }
        },
        "vertice_map": {"kernel": np.zeros((128, 15069), np.float32)},
        "step": np.zeros((), np.int32),
    }
    placed = shard_state_fsdp(mesh, tree, tensor_parallel=True)
    enc = placed["audio_encoder"]["layer0"]
    # TP model axis kept, FSDP claims the other dim
    assert enc["intermediate_dense"]["kernel"].sharding.spec == P("data", "model")
    assert enc["out_proj"]["kernel"].sharding.spec == P("model", "data")
    # small leaves keep their base spec: the TP column-parallel bias stays
    # model-sharded, FSDP adds nothing
    assert enc["intermediate_dense"]["bias"].sharding.spec == P("model")
    # non-encoder large leaf: data only, on the divisible dim
    assert placed["vertice_map"]["kernel"].sharding.spec == P("data")
    assert placed["step"].sharding.spec == P()


def _tiny_faceformer_batch(n_verts, n_onehot, sr, batch=2, seconds=0.25, seed=3):
    n_frames = int(seconds * sr) * 60 // sr
    rng = np.random.default_rng(seed)
    return {
        "audio": rng.normal(size=(batch, int(seconds * sr))).astype(np.float32) * 0.1,
        "audio_lengths": np.full((batch,), int(seconds * sr), np.int32),
        "verts": rng.normal(size=(batch, n_frames, n_verts // 3, 3)).astype(np.float32),
        "frame_lengths": np.full((batch,), n_frames, np.int32),
        "template_vert": rng.normal(size=(batch, n_verts // 3, 3)).astype(np.float32),
        "one_hot": np.eye(n_onehot, dtype=np.float32)[:batch],
    }


@pytest.mark.slow
def test_trainer_fsdp_step_matches_single_device():
    """One FSDP(×TP) faceformer train step == the single-device step: GSPMD's
    all-gather/reduce-scatter insertion is numerically transparent."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    n_verts, n_onehot, sr = 150, 12, 16000
    config = ExpConfig(
        batch_size=2, modelname="faceformer", vertex_count=n_verts,
        one_hot_size=n_onehot, feature_extractor=None, sample_rate=sr,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4,
    )
    batch = _tiny_faceformer_batch(n_verts, n_onehot, sr)

    solo = Audio2FaceExperiment(
        config, mesh=make_mesh((1, 1), devices=jax.devices()[:1]),
        tensorboard=False,
    )
    s1 = solo.init_state(batch)
    s1, m1 = solo.train_step(s1, batch, jax.random.PRNGKey(0))

    exp = Audio2FaceExperiment(
        config, mesh=make_mesh((2, 2), devices=jax.devices()[:4]),
        tensorboard=False, fsdp=True,
    )
    assert exp.fsdp and exp.tensor_parallel
    s2 = exp.init_state(batch)
    # params actually live sharded: TP dim kept, FSDP dim added
    ffn = s2.params["audio_encoder"]["layer0"]["intermediate_dense"]["kernel"]
    assert ffn.sharding.spec == P("data", "model")
    # Adam moments mirror the param shardings (the ZeRO-3 point)
    mu_ffn = jax.tree.leaves(
        jax.tree.map(lambda x: x, s2.opt_state[1].mu["audio_encoder"]["layer0"]["intermediate_dense"])
    )
    assert any(m.sharding.spec == P("data", "model") for m in mu_ffn)
    s2, m2 = exp.train_step(s2, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m2["err"]), float(m1["err"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        ),
        jax.tree.map(np.asarray, s2.params),
        jax.tree.map(np.asarray, s1.params),
    )


@pytest.mark.slow
def test_trainer_fsdp_frame_model_fit_smoke(tmp_path):
    """FSDP on a pure-DP mesh through init/train/eval for a BatchNorm model
    (audio2mesh): batch_stats replicate, state round-trips the fit loop."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    config = ExpConfig(
        batch_size=8, modelname="audio2mesh", vertex_count=180,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4, fsdp=True,
    )
    exp = Audio2FaceExperiment(
        config, mesh=make_mesh((4, 1), devices=jax.devices()[:4]),
        tensorboard=False, log_dir=str(tmp_path),
    )
    assert exp.fsdp
    rng = np.random.default_rng(0)
    batch = {
        "audio": rng.normal(size=(8, 11440)).astype(np.float32) * 0.1,
        "verts": rng.normal(size=(8, 60, 3)).astype(np.float32) * 0.01,
        "template_vert": rng.normal(size=(8, 60, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 8)],
    }
    state = exp.init_state(batch)
    state, metrics = exp.train_step(state, batch, jax.random.PRNGKey(0))
    out = exp.eval_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(out["err"]))
