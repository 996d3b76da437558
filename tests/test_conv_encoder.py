"""Fused conv feature-encoder kernel vs the XLA reference path.

The Pallas kernel (ops/conv_encoder.py) runs the whole 7-layer wav2vec2 conv
stack — layer 0 + analytic group-norm + GELU + layers 1-6 — in one kernel.
On CPU it runs in interpret mode on tiny shapes; matmuls accumulate f32 from
bf16 inputs, so parity vs the f32 XLA path is bounded by bf16 resolution.

Reference semantics: HF wav2vec2-base feature_extractor as used by
/root/reference/src/model/wav2vec.py:91-147.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, FeatureEncoder
from audio2face_tpu.ops.conv_encoder import (
    fused_conv_encoder,
    stack_output_length,
)

L = 2500  # samples -> 7 output frames


@pytest.fixture(scope="module")
def setup():
    cfg = Wav2Vec2Config()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, L)).astype(np.float32) * 0.1)
    fe = FeatureEncoder(cfg, dtype=None)
    variables = jax.jit(fe.init)(jax.random.PRNGKey(0), x)
    kernels = [variables["params"][f"conv{i}"]["kernel"] for i in range(7)]
    gn = variables["params"]["group_norm"]
    return cfg, x, fe, variables, kernels, gn


def test_fused_matches_f32_reference(setup):
    cfg, x, fe, variables, kernels, gn = setup
    ref = fe.apply(variables, x)
    out = fused_conv_encoder(
        x, kernels, gn["scale"], gn["bias"], interpret=True, tile_frames=8
    )
    assert out.shape == (2, stack_output_length(L), 512)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
    scale = np.max(np.abs(np.asarray(ref)))
    assert err < 0.05 * scale, (err, scale)


def test_fused_masked_lengths(setup):
    """Masked group-norm statistics: padded items match the XLA masked path
    on their valid prefix."""
    cfg, x, fe, variables, kernels, gn = setup
    lengths = jnp.asarray([L, L - 800], jnp.int32)
    ref = fe.apply(variables, x, lengths)
    out = fused_conv_encoder(
        x, kernels, gn["scale"], gn["bias"], lengths,
        interpret=True, tile_frames=8,
    )
    feat_lengths = np.asarray(lengths)
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        feat_lengths = (feat_lengths - k) // s + 1
    for b in range(2):
        n = feat_lengths[b]
        err = np.max(np.abs(
            np.asarray(out, np.float32)[b, :n] - np.asarray(ref)[b, :n]
        ))
        assert err < 0.05 * np.max(np.abs(np.asarray(ref))), (b, err)


def test_feature_encoder_dispatch_same_tree(setup):
    """Both execution paths consume one parameter tree (conv{i}/kernel +
    group_norm/{scale,bias}) — the torch converter's naming contract."""
    cfg, x, fe, variables, kernels, gn = setup
    assert set(variables["params"].keys()) == (
        {f"conv{i}" for i in range(7)} | {"group_norm"}
    )
    assert set(gn.keys()) == {"scale", "bias"}
    # bf16 XLA path runs off the same tree
    fe16 = FeatureEncoder(cfg, dtype=jnp.bfloat16)
    out16 = fe16.apply(variables, x, use_pallas=False)
    ref = fe.apply(variables, x)
    err = np.max(np.abs(np.asarray(out16, np.float32) - np.asarray(ref)))
    assert err < 0.05 * np.max(np.abs(np.asarray(ref)))


@pytest.mark.parametrize("length", [2504, 2501, 2503])
def test_fused_stats_non_multiple_of_five(setup, length):
    """Waveform lengths with n % 5 != 0 leave up to TWO fractional windows
    overlapping real samples; the packed-stats build must subtract both
    (regression: only the first was subtracted, skewing mu/corr ~1e-2)."""
    from audio2face_tpu.ops.conv_encoder import (
        _im2col10,
        _packed_im2col_and_stats,
        _round_up,
        conv0_groupnorm_stats,
    )

    cfg, x, fe, variables, kernels, gn = setup
    xs = x[:, :length]
    t0 = (length - 10) // 5 + 1
    t0_pad = _round_up(t0, 128)
    w0 = kernels[0].reshape(10, 512)
    mean_ref, rstd_ref = conv0_groupnorm_stats(_im2col10(xs), w0)
    _, mean, rstd = _packed_im2col_and_stats(xs, w0, t0, t0_pad)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rstd), np.asarray(rstd_ref), rtol=1e-5
    )


def test_feature_encoder_conv_bias_init(setup):
    """conv_bias=True must declare conv{i}/{kernel,bias} under one scope
    (regression: two submodules fought over the conv{i} name)."""
    cfg0, x, *_ = setup
    import dataclasses

    cfg = dataclasses.replace(cfg0, conv_bias=True)
    fe = FeatureEncoder(cfg, dtype=None)
    v = fe.init(jax.random.PRNGKey(0), x[:1, :2000])
    assert set(v["params"]["conv0"].keys()) == {"kernel", "bias"}
    out = fe.apply(v, x[:1, :2000])
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("lens", [(2504, 1997), (2501, 800), (2501, 2501)])
def test_fused_stats_masked_lengths(setup, lens):
    """Per-item masked statistics through the packed narrow-lane-free build
    == the naive masked oracle (regression: the lengths path materialized
    the 12.8x-padded (B, T0, 10) im2col, OOMing HBM on 3-minute batch-8
    clips — found by the round-3 long-clip TPU drive)."""
    from audio2face_tpu.ops.conv_encoder import (
        _im2col10,
        _packed_im2col_and_stats,
        _round_up,
        conv0_groupnorm_stats,
    )

    cfg, x, fe, variables, kernels, gn = setup
    n = max(lens)
    xs = x[: len(lens), :n]
    t0 = (n - 10) // 5 + 1
    t0_pad = _round_up(t0, 128)
    w0 = kernels[0].reshape(10, 512)
    feat = jnp.asarray([(l - 10) // 5 + 1 for l in lens], jnp.int32)
    mean_ref, rstd_ref = conv0_groupnorm_stats(_im2col10(xs), w0, feat)
    _, mean, rstd = _packed_im2col_and_stats(xs, w0, t0, t0_pad, feat)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rstd), np.asarray(rstd_ref), rtol=1e-5)


def test_fused_masked_zero_length_row(setup):
    """A fully-padded row (lengths=0 -> negative raw window count) must
    yield zero stats, not garbage: the unclamped count's `% 8` wraps
    positive and used to sum real-sample windows into mu/corr."""
    cfg, x, fe, variables, kernels, gn = setup
    lengths = jnp.asarray([L, 0], jnp.int32)
    ref = fe.apply(variables, x, lengths)
    out = fused_conv_encoder(
        x, kernels, gn["scale"], gn["bias"], lengths,
        interpret=True, tile_frames=8,
    )
    n = L
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        n = (n - k) // s + 1
    err = np.max(np.abs(np.asarray(out, np.float32)[0, :n] - np.asarray(ref)[0, :n]))
    assert err < 0.05 * np.max(np.abs(np.asarray(ref))), err
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
