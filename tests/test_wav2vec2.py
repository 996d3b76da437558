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
    mask = compute_spec_augment_mask(
        jax.random.PRNGKey(0), 4, 500,
        cfg.mask_time_prob, cfg.mask_time_length, cfg.mask_time_min_masks,
    )
    frac = float(mask.mean())
    assert 0.01 < frac < 0.2
    assert mask.shape == (4, 500)


def test_feature_axis_spec_augment():
    """mask_feature_prob > 0 zeroes whole channels across every time step
    (reference branch src/model/wav2vec.py:162-173)."""
    import dataclasses

    cfg = dataclasses.replace(
        Wav2Vec2Config(
            conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=48, num_layers=0, num_heads=4, intermediate_size=96,
            pos_conv_kernel=16, pos_conv_groups=4,
        ),
        mask_feature_prob=0.3, mask_feature_length=4,
        mask_time_prob=0.0, layerdrop=0.0,
    )
    enc = Wav2Vec2Encoder(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    # intercept hidden states right after SpecAugment by running with the
    # positional conv zeroed: h_out = LN(h + 0) with num_layers=0, so a
    # fully-zeroed channel stays detectably constant over time.
    eval_out = enc.apply({"params": params}, x)
    train_out = enc.apply(
        {"params": params}, x, train=True, apply_spec_augment=True,
        rngs={"dropout": jax.random.PRNGKey(1), "spec_augment": jax.random.PRNGKey(2)},
    )
    assert train_out.shape == eval_out.shape
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))
    # mask distribution sanity on the helper itself
    from audio2face_tpu.models.wav2vec2 import compute_spec_augment_mask

    fmask = compute_spec_augment_mask(jax.random.PRNGKey(0), 4, 48, 0.3, 4)
    assert fmask.shape == (4, 48)
    assert 0.05 < float(fmask.mean()) < 0.6


def test_biwi_trim_branch(flax_params):
    """dataset='biwi' applies the reference's even-trim + 2x-frame cap
    (src/model/wav2vec.py:119-124) instead of interpolation."""
    model = Wav2Vec2Encoder(Wav2Vec2Config())
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32))

    t50 = Wav2Vec2Config().feat_extract_output_length(16000)
    even = t50 - (t50 % 2)
    out = model.apply({"params": flax_params}, x, dataset="biwi")
    assert out.shape[1] == even

    # frame cap: 25 fps video frame count far below the latent rate
    # (the transformer is bidirectional, so only the trim SHAPE is testable —
    # values legitimately differ once the sequence is truncated)
    out_capped = model.apply({"params": flax_params}, x, output_len=10, dataset="biwi")
    assert out_capped.shape[1] == 20


@pytest.mark.slow
def test_fps_fallback_no_int32_overflow():
    """The output_lengths fallback must be exact for clips where
    lengths * output_len overflows int32, and must REFUSE configurations
    whose reduced ratio still overflows (near-coprime lengths) instead of
    silently wrapping. Exercises the REAL encoder path on a tiny model
    (the arithmetic lives in Wav2Vec2Encoder.__call__)."""
    cfg = Wav2Vec2Config(
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=32, num_layers=1, num_heads=4, intermediate_size=64,
        pos_conv_kernel=16, pos_conv_groups=4,
    )
    enc = Wav2Vec2Encoder(cfg)
    # the real 60 s regime: 960000 * 3600 > 2^31, gcd 1200 reduces to 3/800
    n_samples, out_len = 960_000, 3600
    lengths = jnp.asarray([960_000, 123_457], jnp.int32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, n_samples)).astype(np.float32) * 0.1
    )
    params = enc.init(jax.random.PRNGKey(0), x[:1, :4000], output_len=15)["params"]
    out = enc.apply(
        {"params": params}, x, output_len=out_len, lengths=lengths
    )
    assert out.shape == (2, out_len, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()

    # near-coprime reduced ratio (consecutive ints): the int32-exact
    # decomposition is impossible — the encoder must raise at trace time,
    # not silently wrap
    with pytest.raises(ValueError, match="output_lengths"):
        enc.apply(
            {"params": params}, x[:, :119_999], output_len=119_998,
            lengths=lengths,
        )


def test_layerdrop_and_attention_dropout_paths():
    """Train-time regularization (HF base: attention_dropout=0.1,
    layerdrop=0.1) runs and stays finite; eval path is unaffected."""
    cfg = Wav2Vec2Config(
        conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
        pos_conv_kernel=16, pos_conv_groups=4,
    )
    assert cfg.attention_dropout == 0.1 and cfg.layerdrop == 0.1
    enc = Wav2Vec2Encoder(cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4000)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    e1 = enc.apply({"params": params}, x)
    e2 = enc.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    outs = []
    for seed in (1, 2):
        t = enc.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )
        assert np.isfinite(np.asarray(t)).all()
        outs.append(np.asarray(t))
    assert not np.allclose(outs[0], outs[1])  # stochastic across rngs
