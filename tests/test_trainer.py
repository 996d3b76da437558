import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.data.synthetic import generate_synthetic_vocaset
from audio2face_tpu.data.vocaset import VocaDataModule
from audio2face_tpu.training.trainer import Audio2FaceExperiment, torch_adam


def test_torch_adam_matches_torch():
    """Our optax chain must reproduce torch.optim.Adam(weight_decay=wd)
    (the reference optimizer, lightning_model.py:209-213) step for step."""
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    wt = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    target = torch.zeros_like(wt)

    tx = torch_adam(lr, wd)
    wj = jnp.asarray(w0)
    opt_state = tx.init(wj)

    for _ in range(5):
        loss = ((wt - target) ** 2).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

        grad = 2.0 * wj
        updates, opt_state = tx.update(grad, opt_state, wj)
        wj = wj + updates

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("voca"))
    generate_synthetic_vocaset(d, n_verts=60, sentences_per_subject=1, seconds_per_sentence=0.6)
    cfg = ExpConfig(
        batch_size=48, modelname="audio2mesh", vertex_count=180, one_hot_size=12,
        feature_extractor="mfcc", sample_rate=22000, split_frame=True,
        n_feature=32, out_dim=52, win_length=440, percision="32", lr=3e-3,
    )
    dm = VocaDataModule(d, batch_size=cfg.batch_size, split_frame=True)
    dm.setup()
    return cfg, dm


@pytest.mark.slow
def test_fit_reduces_error_and_checkpoints(tiny_setup, tmp_path):
    cfg, dm = tiny_setup
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    state, result = exp.fit(dm, max_epochs=3)
    errs = [h["val/err"] for h in result.history]
    assert errs[-1] < errs[0] * 0.8, f"val err did not improve: {errs}"
    # newest checkpoint reloads and reproduces predictions
    restored = exp.load_checkpoint()
    batch = dm.predict_batch("FaceTalk_170809_00138_TA", "sentence01")
    p1, e1 = exp.predict(state, batch)
    p2, e2 = exp.predict(restored, batch)
    assert np.asarray(p1).shape[1:] == (60, 3)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.slow
def test_mid_run_resume(tiny_setup, tmp_path):
    """fit(resume=True) continues from the newest checkpoint with optimizer
    state and epoch counter — capability absent in the reference."""
    cfg, dm = tiny_setup
    log_dir = str(tmp_path / "run")
    exp = Audio2FaceExperiment(cfg, log_dir=log_dir)
    state, r1 = exp.fit(dm, max_epochs=2)
    step_after = int(state.step)

    exp2 = Audio2FaceExperiment(cfg, log_dir=log_dir)
    state2, r2 = exp2.fit(dm, max_epochs=4, resume=True)
    assert r2.history[0]["epoch"] >= 2  # continued, not restarted
    assert int(state2.step) > step_after


@pytest.mark.slow
def test_periodic_checkpointing(tiny_setup, tmp_path):
    """checkpoint_every_steps=N writes rolling preemption-safety saves: the
    newest two periodic checkpoints are kept, they are step-sortable next to
    the best-val saves, and resume picks up the newest (mid-epoch) state."""
    import os

    cfg, dm = tiny_setup
    log_dir = str(tmp_path / "run")
    exp = Audio2FaceExperiment(cfg, log_dir=log_dir)
    state, _ = exp.fit(dm, max_epochs=2, checkpoint_every_steps=2)
    ckpts = os.listdir(os.path.join(log_dir, "checkpoints"))
    periodic = sorted(
        (c for c in ckpts if c.startswith("periodic-")),
        key=lambda x: int(x.split("=")[-1]),
    )
    assert len(periodic) == 2, ckpts  # rolling: older ones pruned
    assert int(periodic[-1].split("=")[-1]) % 2 == 0
    # a periodic save restores like any other checkpoint (params + opt + step)
    restored = exp.load_checkpoint(
        os.path.join(log_dir, "checkpoints", periodic[-1])
    )
    assert int(restored.step) == int(periodic[-1].split("=")[-1])
    batch = dm.predict_batch("FaceTalk_170809_00138_TA", "sentence01")
    p, _ = exp.predict(restored, batch)
    assert np.isfinite(np.asarray(p)).all()


class _CrashingDM:
    """Proxy datamodule that simulates a preemption: its ``crash_call``-th
    ``train_batches`` iterator dies after ``k`` batches."""

    def __init__(self, dm, crash_call: int, k: int):
        self._dm, self._crash_call, self._k = dm, crash_call, k
        self._calls = 0

    def __getattr__(self, name):
        return getattr(self._dm, name)

    def train_batches(self, rng):
        self._calls += 1
        src = self._dm.train_batches(rng)
        if self._calls != self._crash_call:
            yield from src
            return
        for i, batch in enumerate(src):
            if i == self._k:
                raise RuntimeError("simulated preemption")
            yield batch


@pytest.mark.slow
def test_mid_epoch_resume_finishes_epoch(tiny_setup, tmp_path):
    """Resuming from a mid-epoch periodic checkpoint must finish the
    interrupted epoch's remaining batches (replaying the same (seed, epoch)
    shuffle and per-step RNG streams), not skip to the next epoch — the
    resumed epoch's end-of-epoch val/err equals an uninterrupted run's."""
    cfg, dm = tiny_setup
    n1 = sum(1 for _ in dm.train_batches(np.random.default_rng(0)))
    assert n1 >= 2, "fixture too small to interrupt mid-epoch"
    k = n1 // 2

    exp_a = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "a"))
    _, ra = exp_a.fit(dm, max_epochs=2)
    assert len(ra.history) == 2

    # crash k batches into epoch 1 (train_batches call #3: init consumes
    # call #1 for shapes, epoch 0 is call #2), with a periodic save every
    # step so the newest checkpoint is exactly the crash-point state
    log_b = str(tmp_path / "b")
    exp_c = Audio2FaceExperiment(cfg, log_dir=log_b)
    with pytest.raises(RuntimeError, match="simulated preemption"):
        exp_c.fit(_CrashingDM(dm, crash_call=3, k=k), max_epochs=2,
                  checkpoint_every_steps=1)

    exp_b = Audio2FaceExperiment(cfg, log_dir=log_b)
    _, rb = exp_b.fit(dm, max_epochs=2, resume=True)
    row = rb.history[0]
    assert row["epoch"] == 1, "resume must re-enter the interrupted epoch"
    assert row["steps"] == n1 - k, "resume must train exactly the remainder"
    assert row["val/err"] == ra.history[1]["val/err"], (
        "resumed epoch must reach the uninterrupted run's state exactly"
    )


def test_voca_checkpoint_roundtrip(tiny_setup, tmp_path):
    """VOCA has no batch norm — empty batch_stats must checkpoint cleanly."""
    cfg, dm = tiny_setup
    cfg = cfg.model_copy(update={"modelname": "voca", "n_feature": 16, "out_dim": 29, "win_length": 790})
    dmv = type(dm)(dm.datapath, batch_size=8, split_frame=True)
    dmv.setup()
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    state, _ = exp.fit(dmv, max_epochs=1)
    restored = exp.load_checkpoint()
    batch = dmv.predict_batch("FaceTalk_170809_00138_TA", "sentence01")
    p1, _ = exp.predict(state, batch)
    p2, _ = exp.predict(restored, batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


@pytest.mark.slow
def test_early_stopping(tiny_setup, tmp_path):
    cfg, dm = tiny_setup
    cfg = cfg.model_copy(update={"early_stop_patience": 1, "lr": 0.0})
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    # lr=0 -> val err can never improve after epoch 0 -> stops at patience
    state, result = exp.fit(dm, max_epochs=10, checkpoint=False)
    assert result.epochs_run <= 3


@pytest.mark.slow
def test_song2face_trains(tiny_setup, tmp_path):
    """Registry completeness: song2face runs through the full experiment."""
    cfg, dm = tiny_setup
    cfg = cfg.model_copy(update={"modelname": "song2face"})
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    batch = next(iter(dm.train_batches(np.random.default_rng(0))))
    state = exp.init_state(batch)
    state, metrics = exp.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(exp.eval_step(state, batch)["err"]))


def test_loss_override(tiny_setup, tmp_path):
    """config.loss maps names to real loss classes (the reference stores the
    raw string, a latent crash — lightning_model.py:97)."""
    from audio2face_tpu.losses import VocaLoss

    cfg, dm = tiny_setup
    exp = Audio2FaceExperiment(cfg.model_copy(update={"loss": "voca"}), log_dir=str(tmp_path))
    assert isinstance(exp.loss_fn, VocaLoss)
    with pytest.raises(KeyError):
        Audio2FaceExperiment(cfg.model_copy(update={"loss": "mse"}), log_dir=str(tmp_path))


@pytest.mark.slow
def test_bf16_policy(tiny_setup, tmp_path):
    cfg, dm = tiny_setup
    cfg = cfg.model_copy(update={"percision": "16-mixed"})
    assert cfg.bf16_compute
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    batch = next(iter(dm.train_batches(np.random.default_rng(0))))
    state = exp.init_state(batch)
    # params stay f32 under the mixed policy
    dtypes = {x.dtype for x in jax.tree.leaves(state.params)}
    assert dtypes == {jnp.dtype(jnp.float32)}
    state, metrics = exp.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_gradient_accumulation_matches_full_batch(tmp_path):
    """accumulate_grad_batches=k averages microbatch gradients into ONE
    optimizer update — for a BN/dropout-free model (voca) the post-step
    params must match the plain full-batch step to float round-off
    (reduction-order differences only)."""
    rng = np.random.default_rng(0)
    b = 8
    cfg = ExpConfig(
        batch_size=b, modelname="voca", vertex_count=180, one_hot_size=12,
        feature_extractor="mfcc", sample_rate=22000, split_frame=True,
        n_feature=16, out_dim=29, win_length=790, percision="32", lr=3e-3,
    )
    batch = {
        "audio": rng.normal(size=(b, 11440)).astype(np.float32) * 0.1,
        "verts": rng.normal(size=(b, 60, 3)).astype(np.float32) * 0.01,
        "template_vert": rng.normal(size=(b, 60, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(12, dtype=np.float32)[rng.integers(0, 12, b)],
    }
    key = jax.random.PRNGKey(0)

    full = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "f"), tensorboard=False)
    s0 = full.init_state(batch)
    s_full, m_full = full.train_step(s0, batch, key)

    acc = Audio2FaceExperiment(
        cfg, log_dir=str(tmp_path / "a"), tensorboard=False,
        accumulate_grad_batches=4,
    )
    s0b = acc.init_state(batch)
    s_acc, m_acc = acc.train_step(s0b, batch, key)

    np.testing.assert_allclose(
        float(m_full["loss"]), float(m_acc["loss"]), rtol=1e-5
    )
    for pf, pa in zip(
        jax.tree.leaves(s_full.params), jax.tree.leaves(s_acc.params)
    ):
        np.testing.assert_allclose(
            np.asarray(pf), np.asarray(pa), atol=1e-5, rtol=1e-4
        )

    # a second accumulated step must also run (donation/scan reuse)
    s_acc2, _ = acc.train_step(s_acc, batch, key)
    assert int(s_acc2.step) == 2

    with pytest.raises(ValueError, match=">= 1"):
        Audio2FaceExperiment(cfg, accumulate_grad_batches=0)


@pytest.mark.slow
def test_gradient_accumulation_batchnorm_model_runs(tmp_path):
    """audio2mesh (BatchNorm) under accumulation: BN statistics update per
    microbatch (k sequential torch forwards), so no bit-parity claim —
    but the step must run and reduce loss over a few iterations."""
    rng = np.random.default_rng(1)
    b = 8
    cfg = ExpConfig(
        batch_size=b, modelname="audio2mesh", vertex_count=180, one_hot_size=12,
        feature_extractor="mfcc", sample_rate=22000, split_frame=True,
        n_feature=32, out_dim=52, win_length=440, percision="32", lr=3e-3,
    )
    batch = {
        "audio": rng.normal(size=(b, 11440)).astype(np.float32) * 0.1,
        "verts": rng.normal(size=(b, 60, 3)).astype(np.float32) * 0.01,
        "template_vert": rng.normal(size=(b, 60, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(12, dtype=np.float32)[rng.integers(0, 12, b)],
    }
    exp = Audio2FaceExperiment(
        cfg, log_dir=str(tmp_path / "bn"), tensorboard=False,
        accumulate_grad_batches=2,
    )
    state = exp.init_state(batch)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, m = exp.train_step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
