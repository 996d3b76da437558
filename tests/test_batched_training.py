"""Batched (B>1) padded whole-clip FaceFormer training.

The reference trains FaceFormer strictly at batch_size=1
(/root/reference/train.py:30-34) because its wav2vec2 group norm and loss are
padding-sensitive. This framework's length-aware encoder
(models/wav2vec2.py: masked group norm, per-item fps adapter) plus
``masked_faceformer_loss`` lift that cap. These tests pin the semantics:

- a padded B>1 batch produces exactly the length-weighted combination of the
  per-item unpadded losses (and, for equal lengths, the mean of per-item
  gradients);
- the full ``Audio2FaceExperiment.train_step`` on a B>1 batch over an 8-way
  data-parallel mesh matches the same step on a single device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2face_tpu.losses import masked_faceformer_loss
from audio2face_tpu.models.faceformer import FaceFormer, frame_count

SR = 16000
N_VERTS = 300  # 100 vertices


def _mk_model():
    return FaceFormer(n_verts=N_VERTS, n_onehot=12, dtype=None, decode_impl="scan")


@pytest.fixture(scope="module")
def tiny():
    model = _mk_model()
    rng = np.random.default_rng(0)
    n = int(0.25 * SR)
    audio = jnp.asarray((rng.normal(size=(2, n)) * 0.1).astype(np.float32))
    one_hot = jnp.asarray(np.eye(12, dtype=np.float32)[[1, 7]])
    template = jnp.asarray(rng.normal(size=(2, N_VERTS // 3, 3)).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), audio[:1], one_hot[:1], template[:1]
    )["params"]
    # move the zero-init vertice maps off zero so gradients flow everywhere
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).normal(size=p.shape).astype(p.dtype),
        params,
    )
    return model, params, audio, one_hot, template


@pytest.mark.slow
def test_padded_batch_loss_is_length_weighted_combination(tiny):
    """loss(batch) == (sum_i n_i*rec_i)/(sum n_i) + 10*(sum_i p_i*vel_i)/(sum p_i)
    with rec_i/vel_i from exact unpadded B=1 runs."""
    model, params, audio, one_hot, template = tiny
    rng = np.random.default_rng(2)
    lens = [int(0.25 * SR), int(0.15 * SR)]
    t_pad = frame_count(audio.shape[1])
    gt = jnp.asarray(rng.normal(size=(2, t_pad, N_VERTS // 3, 3)).astype(np.float32))

    lengths = jnp.asarray(lens, jnp.int32)
    pred, fmask = model.apply(
        {"params": params}, audio, one_hot, template, lengths=lengths
    )
    batch = masked_faceformer_loss(pred, gt, fmask)

    recs, vels, ns, ps = [], [], [], []
    for i, n in enumerate(lens):
        t_i = frame_count(n)
        p_i = model.apply(
            {"params": params}, audio[i : i + 1, :n], one_hot[i : i + 1],
            template[i : i + 1],
        )
        solo = masked_faceformer_loss(
            p_i, gt[i : i + 1, :t_i], jnp.ones((1, t_i))
        )
        recs.append(float(solo["rec_loss"]))
        vels.append(float(solo["vel_loss"]))
        ns.append(t_i)
        ps.append(t_i // 2)

    want_rec = sum(n * r for n, r in zip(ns, recs)) / sum(ns)
    want_vel = sum(p * v for p, v in zip(ps, vels)) / sum(ps)
    np.testing.assert_allclose(float(batch["rec_loss"]), want_rec, rtol=2e-4)
    np.testing.assert_allclose(float(batch["vel_loss"]), want_vel, rtol=2e-4)
    np.testing.assert_allclose(
        float(batch["loss"]), want_rec + 10.0 * want_vel, rtol=2e-4
    )


@pytest.mark.slow
def test_padded_batch_grads_match_per_item_mean(tiny):
    """Equal-length clips in a padded buffer: batch gradient == mean of the
    per-item single-clip (unpadded) gradients."""
    model, params, audio, one_hot, template = tiny
    rng = np.random.default_rng(3)
    n = int(0.2 * SR)  # valid samples; buffer is 0.25 s -> real padding
    t_i = frame_count(n)
    t_pad = frame_count(audio.shape[1])
    gt = jnp.asarray(rng.normal(size=(2, t_pad, N_VERTS // 3, 3)).astype(np.float32))
    gt = gt.at[:, t_i:].set(0.0)

    def batch_loss(params):
        pred, fmask = model.apply(
            {"params": params}, audio, one_hot, template,
            lengths=jnp.asarray([n, n], jnp.int32),
        )
        return masked_faceformer_loss(pred, gt, fmask)["loss"]

    g_batch = jax.grad(batch_loss)(params)

    def item_loss(params, i):
        pred = model.apply(
            {"params": params}, audio[i : i + 1, :n], one_hot[i : i + 1],
            template[i : i + 1],
        )
        return masked_faceformer_loss(
            pred, gt[i : i + 1, :t_i], jnp.ones((1, t_i))
        )["loss"]

    g0 = jax.grad(item_loss)(params, 0)
    g1 = jax.grad(item_loss)(params, 1)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)

    flat_b = jax.tree_util.tree_leaves(g_batch)
    flat_m = jax.tree_util.tree_leaves(g_mean)
    # absolute floor from the global gradient scale: leaves whose gradient is
    # float-cancellation noise (~1e-11) shouldn't fail a relative check
    gscale = max(float(jnp.max(jnp.abs(m))) for m in flat_m)
    for b, m in zip(flat_b, flat_m):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(m), atol=5e-6 * gscale, rtol=6e-3
        )


@pytest.mark.slow
def test_faceformer_dp_train_step_matches_single_device(tmp_path):
    """Full train_step (masked loss, torch-Adam, x100 scaling) on a B=8
    padded batch: 8-way data-parallel mesh == single device.

    slow (~11 min): two full-model CPU train-step compilations dominate.
    The default suite covers the same semantics compositionally:
    test_padded_batch_grads_match_per_item_mean (batched masked-loss
    gradients) + test_parallel.test_dp_training_step_matches_single_device
    (DP gradient exactness)."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.parallel.mesh import make_mesh
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    cfg = ExpConfig(
        batch_size=8, modelname="faceformer", vertex_count=N_VERTS,
        one_hot_size=12, feature_extractor=None, sample_rate=SR,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-3,
    )
    rng = np.random.default_rng(0)
    n_buf = int(0.2 * SR)
    lens = np.asarray([n_buf, n_buf, 2400, 2400, 1600, 1600, n_buf, n_buf], np.int32)
    t_pad = frame_count(n_buf)
    batch = {
        "audio": (rng.normal(size=(8, n_buf)) * 0.1).astype(np.float32),
        "audio_lengths": lens,
        "verts": rng.normal(size=(8, t_pad, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "frame_lengths": (lens * 60 // SR).astype(np.int32),
        "template_vert": rng.normal(size=(8, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 8)],
    }

    exp_dp = Audio2FaceExperiment(
        cfg, log_dir=str(tmp_path / "dp"), tensorboard=False,
        mesh=make_mesh((8, 1)),
    )
    exp_1 = Audio2FaceExperiment(
        cfg, log_dir=str(tmp_path / "s"), tensorboard=False,
        mesh=make_mesh((1, 1), devices=[jax.devices()[0]]),
    )
    state_dp = exp_dp.init_state(batch)
    state_1 = exp_1.init_state(batch)

    # train-step loss/err metrics come from the sharded forward+backward and
    # are pre-optimizer — exact parity is required across the mesh boundary.
    # Post-Adam parameters are NOT compared: for near-zero gradients Adam's
    # g/(sqrt(v)+eps) amplifies accumulation-order noise into +-lr sign
    # flips, so param equality is not a meaningful invariant.
    key = jax.random.PRNGKey(0)
    state_dp, m_dp = exp_dp.train_step(state_dp, batch, key)
    state_1, m_1 = exp_1.train_step(state_1, batch, key)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["err"]), float(m_1["err"]), rtol=1e-5)

    # and DP training actually learns: loss drops after the step
    first = float(m_dp["loss"])
    for i in range(1, 3):
        state_dp, m_dp = exp_dp.train_step(state_dp, batch, jax.random.PRNGKey(i))
    assert float(m_dp["loss"]) < first, (first, float(m_dp["loss"]))
