"""Pipeline parallelism: the wav2vec2 transformer stack split into stages
over the mesh, microbatches streamed GPipe-style via ppermute.

Oracle: the unsharded encoder with the same variables — PP must be a pure
re-scheduling of the same computation (each microbatch passes through every
layer exactly once, attention per microbatch sees full T), so outputs AND
gradients match to float round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.parallel.mesh import make_mesh
from audio2face_tpu.parallel.pipeline import (
    pipeline_parallel_encode,
    pipeline_parallel_layers,
    stack_stage_params,
)

# 4 layers -> stage counts 2 and 4 both divide
CFG = Wav2Vec2Config(
    conv_dim=(48, 48), conv_kernel=(10, 3), conv_stride=(5, 2),
    hidden_size=48, num_layers=4, num_heads=4, intermediate_size=96,
    pos_conv_kernel=16, pos_conv_groups=4,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(4, 4000)).astype(np.float32) * 0.1)
    encoder = Wav2Vec2Encoder(CFG)
    variables = encoder.init(jax.random.PRNGKey(0), audio)
    return encoder, variables, audio


@pytest.mark.slow
@pytest.mark.parametrize("n_stages", [2, 4])
def test_pp_matches_unsharded(setup, n_stages):
    """n_stages-deep pipeline (microbatch size 1) == the plain encoder."""
    encoder, variables, audio = setup
    want = encoder.apply(variables, audio)

    mesh = make_mesh((1, n_stages), devices=jax.devices()[:n_stages])
    got = pipeline_parallel_encode(variables, audio, mesh, config=CFG)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_pp_microbatch_gt1_and_padded_lengths(setup):
    """Microbatches of 2 with ragged per-item valid lengths: the valid
    prefixes match the unsharded padded forward."""
    encoder, variables, audio = setup
    lengths = jnp.asarray([4000, 2600, 3300, 4000], jnp.int32)
    want = encoder.apply(variables, audio, None, lengths)

    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    got = pipeline_parallel_encode(
        variables, audio, mesh, n_micro=2, lengths=lengths, config=CFG
    )
    fl = [CFG.feat_extract_output_length(int(n)) for n in lengths]
    for i in range(audio.shape[0]):
        np.testing.assert_allclose(
            np.asarray(got)[i, : fl[i]], np.asarray(want)[i, : fl[i]],
            atol=2e-5, rtol=1e-5,
        )


@pytest.mark.slow
def test_pp_dp_combined(setup):
    """2x2 mesh: microbatch dim sharded over data, stages over model."""
    encoder, variables, audio = setup
    want = encoder.apply(variables, audio)

    mesh = make_mesh((2, 2), devices=jax.devices()[:4])
    got = pipeline_parallel_encode(
        variables, audio, mesh, n_micro=2, config=CFG, data_axis="data"
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_pp_gradients_match(setup):
    """jax.grad through the pipeline (scan + ppermute + psum all have exact
    transposes) == grad through the plain layer stack, i.e. the schedule is
    training-capable, not inference-only."""
    encoder, variables, audio = setup
    h, _ = encoder.apply(variables, audio, use_pallas=False, pre_layers_only=True)
    mesh = make_mesh((1, 2), devices=jax.devices()[:2])

    from audio2face_tpu.models.wav2vec2 import EncoderLayer

    def loss_ref(params):
        x = h
        for i in range(CFG.num_layers):
            x = EncoderLayer(CFG).apply({"params": params[f"layer{i}"]}, x)
        return jnp.mean(x**2)

    def loss_pp(params):
        x = pipeline_parallel_layers(params, h, mesh, config=CFG)
        return jnp.mean(x**2)

    layer_params = {
        f"layer{i}": variables["params"][f"layer{i}"]
        for i in range(CFG.num_layers)
    }
    g_ref = jax.grad(loss_ref)(layer_params)
    g_pp = jax.grad(loss_pp)(layer_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        g_ref, g_pp,
    )


def test_stack_stage_params_rejects_uneven(setup):
    _, variables, _ = setup
    with pytest.raises(ValueError):
        stack_stage_params(variables["params"], 3, CFG)
