"""Parity of the Flax wav2vec2 encoder vs HF's PyTorch implementation
(random-init base config — no network needed; matching random weights implies
matching pretrained weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio2face_tpu.compat.torch_convert import state_dict_to_numpy
from audio2face_tpu.compat.wav2vec2_convert import convert_wav2vec2
from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    # default HF config == base-960h architecture
    cfg = HFConfig(do_stable_layer_norm=False, feat_extract_norm="group")
    model = HFModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_params(hf_model):
    sd = state_dict_to_numpy(hf_model)
    return jax.tree.map(jnp.asarray, convert_wav2vec2(sd))


def test_feature_encoder_parity(hf_model, flax_params):
    from audio2face_tpu.models.wav2vec2 import FeatureEncoder

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8000)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model.feature_extractor(torch.as_tensor(x)).transpose(1, 2).numpy()
    ours = np.asarray(
        FeatureEncoder(Wav2Vec2Config()).apply(
            {"params": flax_params["feature_encoder"]}, jnp.asarray(x)
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


def test_full_encoder_parity(hf_model, flax_params):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16000)).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(torch.as_tensor(x)).last_hidden_state.numpy()
    ours = np.asarray(
        Wav2Vec2Encoder(Wav2Vec2Config()).apply({"params": flax_params}, jnp.asarray(x))
    )
    assert ours.shape == ref.shape  # (1, 49, 768)
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"max hidden-state err {err}"


def test_fps_adapter_parity(hf_model, flax_params):
    """The reference inserts align_corners linear interp between the conv
    encoder and feature projection (src/model/wav2vec.py:125-128,147-181).
    Replicate that pipeline in torch as the oracle."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 16000)).astype(np.float32)
    frame_num = 60  # 1 s at 60 fps

    with torch.no_grad():
        h = hf_model.feature_extractor(torch.as_tensor(x)).transpose(1, 2)
        h = torch.nn.functional.interpolate(
            h.transpose(1, 2), size=frame_num, align_corners=True, mode="linear"
        ).transpose(1, 2)
        h, _ = hf_model.feature_projection(h)
        ref = hf_model.encoder(h).last_hidden_state.numpy()

    ours = np.asarray(
        Wav2Vec2Encoder(Wav2Vec2Config()).apply(
            {"params": flax_params}, jnp.asarray(x), output_len=frame_num
        )
    )
    assert ours.shape == ref.shape == (1, frame_num, 768)
    err = np.abs(ours - ref).max()
    assert err < 1e-3, f"max hidden-state err {err}"


def test_padded_batch_prefix_consistency(flax_params):
    """Batched padded inference: the valid prefix of a padded item must match
    the unpadded single-item result (capability the bs=1 reference lacks)."""
    rng = np.random.default_rng(3)
    x1 = rng.normal(size=(1, 12000)).astype(np.float32)
    x_pad = np.concatenate([x1, np.zeros((1, 4000), np.float32)], axis=1)

    model = Wav2Vec2Encoder(Wav2Vec2Config())
    single = np.asarray(model.apply({"params": flax_params}, jnp.asarray(x1)))
    t_valid = single.shape[1]
    batched = np.asarray(
        model.apply(
            {"params": flax_params}, jnp.asarray(x_pad),
            lengths=jnp.asarray([12000]),
        )
    )
    # padded positions are zeroed + attention is length-masked, so the valid
    # prefix (away from the off-by-one tail frame) must agree closely
    m = t_valid - 2
    err = np.abs(batched[:, :m] - single[:, :m]).max()
    assert err < 2e-3, f"padded-batch prefix err {err}"


def test_spec_augment_masks_fraction():
    from audio2face_tpu.models.wav2vec2 import compute_spec_augment_mask

    cfg = Wav2Vec2Config()
    mask = compute_spec_augment_mask(jax.random.PRNGKey(0), 4, 500, cfg)
    frac = float(mask.mean())
    assert 0.01 < frac < 0.2
    assert mask.shape == (4, 500)
