"""Sequence (context) parallelism: wav2vec2's transformer stack sharded on
the TIME axis over the mesh, K/V all-gathered per layer.

Oracle: the unsharded encoder with the same variables — SP must be a pure
re-partitioning of the same computation (attention sees identical global
keys via the gather, tokens are otherwise local), so outputs match to
float round-off including padded-tail masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.parallel.mesh import make_mesh
from audio2face_tpu.parallel.sequence import (
    sequence_parallel_encode,
    sequence_parallel_layers,
)

CFG = Wav2Vec2Config(
    conv_dim=(48, 48), conv_kernel=(10, 3), conv_stride=(5, 2),
    hidden_size=48, num_layers=3, num_heads=4, intermediate_size=96,
    pos_conv_kernel=16, pos_conv_groups=4,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(1, 4000)).astype(np.float32) * 0.1)
    encoder = Wav2Vec2Encoder(CFG)
    variables = encoder.init(jax.random.PRNGKey(0), audio)
    return encoder, variables, audio


@pytest.mark.slow
def test_sp_layers_match_unsharded(setup):
    """4-way time sharding of the layer stack == the plain encoder, with a
    T not divisible by the mesh axis (padded tail masked out)."""
    encoder, variables, audio = setup
    want = encoder.apply(variables, audio)
    t = want.shape[1]
    assert t % 4 != 0  # the test must exercise tail padding

    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    got = sequence_parallel_encode(variables, audio, mesh, config=CFG)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_sp_respects_padded_batch_lengths(setup):
    """Per-item valid lengths mask attention identically under SP: a padded
    batch's valid prefixes match the unsharded padded forward."""
    encoder, variables, audio = setup
    rng = np.random.default_rng(1)
    b2 = jnp.concatenate(
        [audio, jnp.asarray(rng.normal(size=(1, 4000)).astype(np.float32) * 0.1)]
    )
    lengths = jnp.asarray([4000, 2700], jnp.int32)
    want = encoder.apply(variables, b2, None, lengths)

    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    got = sequence_parallel_encode(
        variables, b2, mesh, lengths=lengths, config=CFG
    )
    feat_valid = [CFG.feat_extract_output_length(int(n)) for n in lengths]
    for i, fv in enumerate(feat_valid):
        np.testing.assert_allclose(
            np.asarray(got)[i, :fv], np.asarray(want)[i, :fv],
            atol=2e-5, rtol=1e-5,
        )


@pytest.mark.slow
def test_sp_layers_entry_point(setup):
    """The split-point API: pre_layers_only + sequence_parallel_layers is
    the same computation as the fused convenience wrapper."""
    encoder, variables, audio = setup
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    h, fl = encoder.apply(variables, audio, pre_layers_only=True)
    assert fl is None
    got = sequence_parallel_layers(
        variables["params"], h, mesh, config=CFG
    )
    want = sequence_parallel_encode(variables, audio, mesh, config=CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_sp_gather_output_matches_sharded(setup):
    """gather_output=True (the serving mode: output replicated so the
    Pallas decode kernel downstream never sees sharded operands) is the
    same computation as the time-sharded default."""
    encoder, variables, audio = setup
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    want = sequence_parallel_encode(variables, audio, mesh, config=CFG)
    got = sequence_parallel_encode(
        variables, audio, mesh, config=CFG, gather_output=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.slow
def test_faceformer_predictor_sp_mesh_matches_solo():
    """End-to-end sequence-parallel serving: FaceFormerPredictor(sp_mesh=)
    time-shards the full-size wav2vec2 encoder over 2 chips and reproduces
    the single-device predictor on ragged padded clips."""
    from audio2face_tpu.serving import FaceFormerPredictor

    rng = np.random.default_rng(3)
    solo = FaceFormerPredictor(
        n_verts=150, bf16=False, bucket_seconds=0.5, seed=1
    )
    sp = FaceFormerPredictor(
        n_verts=150, bf16=False, bucket_seconds=0.5,
        variables=solo.variables,
        sp_mesh=make_mesh((2, 1), devices=jax.devices()[:2]),
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        FaceFormerPredictor(
            n_verts=150, variables=solo.variables,
            mesh=make_mesh((2, 1), devices=jax.devices()[:2]),
            sp_mesh=make_mesh((2, 1), devices=jax.devices()[:2]),
        )
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.5, 0.35)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 5]]
    template = rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    want = solo(audios, one_hot, template)
    got = sp(audios, one_hot, template)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)
