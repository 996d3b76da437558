"""Checkpoint-conversion parity: random-init torch mirrors -> Flax forward.

Target: max |Δvertex| < 1e-4 (BASELINE.md) — met here at ~1e-6 in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio2face_tpu.compat.torch_convert import (
    convert_audio2mesh,
    convert_song2face,
    convert_voca,
    state_dict_to_numpy,
)
from audio2face_tpu.models import Audio2Mesh, Song2Face, Voca

from tests.torch_mirrors import TorchAudio2Mesh, TorchSong2Face, TorchVoca

N_VERTS = 15069  # 5023 * 3
N_ONEHOT = 12


def _run_pair(torch_model, flax_model, convert, x, one_hot, template):
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(
            torch.as_tensor(x), torch.as_tensor(one_hot), torch.as_tensor(template)
        ).numpy()
    variables = jax.tree.map(jnp.asarray, convert(state_dict_to_numpy(torch_model)))
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), jnp.asarray(one_hot), jnp.asarray(template))
    )
    return ref, ours


def _inputs(rng, bs, feat_shape):
    x = rng.normal(size=(bs, *feat_shape)).astype(np.float32)
    one_hot = np.zeros((bs, N_ONEHOT), np.float32)
    one_hot[np.arange(bs), rng.integers(0, N_ONEHOT, bs)] = 1.0
    template = rng.normal(size=(bs, N_VERTS // 3, 3)).astype(np.float32)
    return x, one_hot, template


def test_audio2mesh_parity():
    rng = np.random.default_rng(0)
    x, one_hot, template = _inputs(rng, 3, (52, 32))
    torch.manual_seed(0)
    ref, ours = _run_pair(
        TorchAudio2Mesh(N_VERTS, N_ONEHOT), Audio2Mesh(N_VERTS, N_ONEHOT),
        convert_audio2mesh, x, one_hot, template,
    )
    assert ref.shape == ours.shape == (3, 5023, 3)
    err = np.abs(ref - ours).max()
    assert err < 1e-4, f"max vertex err {err}"


def test_voca_parity():
    rng = np.random.default_rng(1)
    x, one_hot, template = _inputs(rng, 4, (29, 16))
    torch.manual_seed(1)
    ref, ours = _run_pair(
        TorchVoca(N_VERTS, N_ONEHOT), Voca(N_VERTS, N_ONEHOT),
        convert_voca, x, one_hot, template,
    )
    err = np.abs(ref - ours).max()
    assert err < 1e-4, f"max vertex err {err}"


def test_song2face_parity():
    rng = np.random.default_rng(2)
    x, one_hot, template = _inputs(rng, 2, (52, 32))
    torch.manual_seed(2)
    ref, ours = _run_pair(
        TorchSong2Face(N_VERTS, N_ONEHOT), Song2Face(N_VERTS, N_ONEHOT),
        convert_song2face, x, one_hot, template,
    )
    err = np.abs(ref - ours).max()
    assert err < 1e-4, f"max vertex err {err}"


def test_onehot_tiling_matches_torch_view():
    """The rotated-row tiling quirk (audio2face.py:59) must match exactly."""
    from audio2face_tpu.models.layers import tile_onehot_rows

    one_hot = np.zeros((1, 12), np.float32)
    one_hot[0, 3] = 1.0
    ours = np.asarray(tile_onehot_rows(jnp.asarray(one_hot), 12, 32))[0]
    ref = torch.as_tensor(one_hot).repeat(1, 32).view(1, 12, 32).numpy()[0]
    np.testing.assert_array_equal(ours, ref)
    # sanity: rows are NOT all identical (32 % 12 != 0 rotates them)
    assert not (ours == ours[0]).all()


def test_scan_lstm_matches_torch():
    from audio2face_tpu.models.layers import ScanLSTM

    torch.manual_seed(3)
    t_lstm = torch.nn.LSTM(64, 32, 1, bidirectional=False, batch_first=True)
    x = np.random.default_rng(3).normal(size=(2, 17, 64)).astype(np.float32)
    with torch.no_grad():
        ref, _ = t_lstm(torch.as_tensor(x))
    sd = state_dict_to_numpy(t_lstm)
    params = {
        "w_ih": sd["weight_ih_l0"].T, "w_hh": sd["weight_hh_l0"].T,
        "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"],
    }
    ours = ScanLSTM(32).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.slow
def test_models_bf16_train_step():
    """bf16-compute train mode (the '16-mixed' config path) jits for all
    three frame models — pins the ScanLSTM carry-dtype invariant that only
    the bf16 path exercises (a float32 recurrent matmul inside the scan
    promoted the carry and broke lax.scan on the first TPU song2face run)."""
    rng = np.random.default_rng(11)
    for model_cls, feat in [(Audio2Mesh, (52, 32)), (Voca, (29, 16)), (Song2Face, (52, 32))]:
        model = model_cls(n_verts=300, n_onehot=N_ONEHOT, dtype=jnp.bfloat16)
        x, one_hot, template = _inputs(rng, 2, feat)
        template = template[:, :100]
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(one_hot),
            jnp.asarray(template)
        )

        @jax.jit
        def step(variables, x, one_hot, template):
            return model.apply(
                variables, x, one_hot, template, train=True,
                mutable=["batch_stats"] if "batch_stats" in variables else [],
            )

        out, _ = step(variables, jnp.asarray(x), jnp.asarray(one_hot), jnp.asarray(template))
        assert out.dtype == jnp.float32  # vertex outputs stay f32
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_models_jit_and_train_mode():
    """Train-mode forward (batch_stats mutable) runs under jit for all three."""
    rng = np.random.default_rng(4)
    for model_cls, feat in [(Audio2Mesh, (52, 32)), (Voca, (29, 16)), (Song2Face, (52, 32))]:
        model = model_cls(n_verts=300, n_onehot=N_ONEHOT)
        x, one_hot, template = _inputs(rng, 2, feat)
        template = template[:, :100]
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(one_hot), jnp.asarray(template))

        @jax.jit
        def step(variables, x, one_hot, template):
            return model.apply(
                variables, x, one_hot, template, train=True,
                mutable=["batch_stats"] if "batch_stats" in variables else [],
            )

        out, _ = step(variables, jnp.asarray(x), jnp.asarray(one_hot), jnp.asarray(template))
        assert out.shape == (2, 100, 3)
        assert np.isfinite(np.asarray(out)).all()
