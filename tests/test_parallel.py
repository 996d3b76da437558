"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audio2face_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tensor_parallel,
    wav2vec2_param_spec,
)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force an 8-device CPU mesh"
    m = make_mesh((-1, 1))
    assert m.devices.shape == (8, 1)
    m = make_mesh((4, 2))
    assert m.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh((3, 2))


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh((8, 1))
    batch = {"audio": np.zeros((16, 100), np.float32), "one_hot": np.zeros((16, 12), np.float32)}
    out = shard_batch(mesh, batch)
    assert out["audio"].sharding.spec == P("data")


def test_dp_training_step_matches_single_device():
    """Gradient step on an 8-way data-parallel mesh == single-device step."""
    mesh = make_mesh((8, 1))

    w = jnp.asarray(np.random.default_rng(0).normal(size=(12, 4)).astype(np.float32))
    x = np.random.default_rng(1).normal(size=(16, 12)).astype(np.float32)
    y = np.random.default_rng(2).normal(size=(16, 4)).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean(jnp.square(x @ w - y))

    g_single = jax.grad(loss)(w, jnp.asarray(x), jnp.asarray(y))

    wr = replicate(mesh, w)
    xs = shard_batch(mesh, {"x": x, "y": y})
    g_sharded = jax.jit(jax.grad(loss))(wr, xs["x"], xs["y"])
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5)


def test_wav2vec2_tp_spec_rules():
    class FakeKey:
        def __init__(self, key):
            self.key = key

    def spec_for(*names):
        return wav2vec2_param_spec(tuple(FakeKey(n) for n in names), None)

    assert spec_for("layer0", "q_proj", "kernel") == P(None, "model")
    assert spec_for("layer0", "q_proj", "bias") == P("model")
    assert spec_for("layer0", "out_proj", "kernel") == P("model", None)
    assert spec_for("layer0", "out_proj", "bias") == P()
    assert spec_for("layer3", "intermediate_dense", "kernel") == P(None, "model")
    assert spec_for("layer3", "output_dense", "kernel") == P("model", None)
    assert spec_for("feature_projection", "projection", "kernel") == P()
    assert spec_for("layer1", "layer_norm", "scale") == P()


@pytest.mark.slow
def test_wav2vec2_tensor_parallel_forward_matches_replicated():
    """TP-sharded wav2vec2 forward == replicated forward (GSPMD collectives)."""
    from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
        pos_conv_kernel=16, pos_conv_groups=4,
    )
    enc = Wav2Vec2Encoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2000)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    ref = enc.apply({"params": params}, x)

    mesh = make_mesh((4, 2))
    params_tp = shard_params_tensor_parallel(mesh, params)
    x_sh = shard_batch(mesh, {"x": np.asarray(x)})["x"]
    out = jax.jit(lambda p, x: enc.apply({"params": p}, x))(params_tp, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_trainer_tensor_parallel_step_matches_single_device():
    """Audio2FaceExperiment auto-enables TP on a mesh with a model axis;
    one DP×TP faceformer train step == the single-device step (metrics and
    updated params), i.e. the user-facing trainer — not just the dryrun —
    carries tensor parallelism."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    n_verts, n_onehot, sr = 150, 12, 16000
    config = ExpConfig(
        batch_size=2, modelname="faceformer", vertex_count=n_verts,
        one_hot_size=n_onehot, feature_extractor=None, sample_rate=sr,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4,
    )
    seconds = 0.25
    n_frames = int(seconds * sr) * 60 // sr
    rng = np.random.default_rng(3)
    batch = {
        "audio": rng.normal(size=(2, int(seconds * sr))).astype(np.float32) * 0.1,
        "audio_lengths": np.full((2,), int(seconds * sr), np.int32),
        "verts": rng.normal(size=(2, n_frames, n_verts // 3, 3)).astype(np.float32),
        "frame_lengths": np.full((2,), n_frames, np.int32),
        "template_vert": rng.normal(size=(2, n_verts // 3, 3)).astype(np.float32),
        "one_hot": np.eye(n_onehot, dtype=np.float32)[:2],
    }

    solo = Audio2FaceExperiment(
        config, mesh=make_mesh((1, 1), devices=jax.devices()[:1]),
        tensorboard=False,
    )
    assert not solo.tensor_parallel
    s1 = solo.init_state(batch)
    s1, m1 = solo.train_step(s1, batch, jax.random.PRNGKey(0))

    tp = Audio2FaceExperiment(
        config, mesh=make_mesh((2, 2), devices=jax.devices()[:4]),
        tensorboard=False,
    )
    assert tp.tensor_parallel  # auto-enabled by the model axis
    s2 = tp.init_state(batch)
    # the encoder params actually live sharded on the model axis
    qk = s2.params["audio_encoder"]["layer0"]["q_proj"]["kernel"]
    assert qk.sharding.spec == P(None, "model")
    s2, m2 = tp.train_step(s2, batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        float(m2["loss"]), float(m1["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2["err"]), float(m1["err"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4
        ),
        jax.tree.map(np.asarray, s2.params),
        jax.tree.map(np.asarray, s1.params),
    )


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """Cheap in-process variant: conftest's 8-device CPU mesh covers n=2."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_self_provisions():
    """Simulate the driver environment: a backend with ONE visible device.

    ``dryrun_multichip`` must detect the shortfall and re-exec itself onto a
    virtual CPU mesh (MULTICHIP_r01 failed precisely because it used
    ``jax.devices()`` as-is under the single-TPU driver). This test does NOT
    rely on conftest's env: the child process pins 1 CPU device.
    """
    import os
    import subprocess
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the env var alone is overridden on hosts where the axon TPU plugin
    # force-registers itself; A2F_FORCE_PLATFORM pins CPU through the config
    # API before backend init, so this test NEVER attaches to a real
    # (single-tenant) TPU — concurrent TPU work would crash/wedge otherwise
    env["A2F_FORCE_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = "import __graft_entry__ as g; g.dryrun_multichip(4)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_entry_full():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
