"""FaceFormer parity: the Flax KV-cached scan decode must equal the
reference's naive O(T^2)-recompute autoregressive loop (torch oracle) after
checkpoint conversion — and stay under the 1e-4 vertex tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio2face_tpu.compat.faceformer_convert import convert_faceformer
from audio2face_tpu.compat.torch_convert import state_dict_to_numpy
from audio2face_tpu.models.faceformer import FaceFormer, frame_count, periodic_positional_encoding

N_VERTS = 15069
N_ONEHOT = 12


@pytest.fixture(scope="module")
def pair():
    from tests.torch_mirrors import TorchFaceFormer

    torch.manual_seed(0)
    oracle = TorchFaceFormer(N_VERTS, N_ONEHOT)
    # randomize the zero-init'd motion maps to simulate trained weights
    with torch.no_grad():
        for lin in (oracle.vertice_map, oracle.vertice_map_r):
            lin.weight.normal_(0, 0.02)
            lin.bias.normal_(0, 0.02)
    oracle.eval()
    variables = jax.tree.map(jnp.asarray, convert_faceformer(state_dict_to_numpy(oracle)))
    model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT)
    return oracle, model, variables


def test_ppe_table_matches_reference():
    pe = periodic_positional_encoding()
    ref = np.zeros((60, 64), np.float64)
    position = np.arange(60)[:, None]
    div = np.exp(np.arange(0, 64, 2) * (-np.log(10000.0) / 64))
    ref[:, 0::2] = np.sin(position * div)
    ref[:, 1::2] = np.cos(position * div)
    np.testing.assert_allclose(pe, ref.astype(np.float32), atol=1e-6)


def test_frame_count():
    assert frame_count(16000) == 60
    assert frame_count(127600 * 16000 // 22000) == 348  # the bundled 5.8 s clip


def test_frame_count_int32_arrays_no_overflow():
    """Sample counts arrive as int32 device arrays in serving; the naive
    ``n*60//16000`` wraps past ~37 minutes of audio (2^31/60 samples).
    A 40-minute clip must produce the exact frame count, silently-wrapped
    garbage being precisely what sequence-parallel long-clip serving
    would otherwise feed the fps adapter."""
    lens = [38_400_000, 60 * 16000, 127, 0]  # 40 min, 60 s, sub-frame, empty
    got = frame_count(jnp.asarray(lens, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(got), [n * 60 // 16000 for n in lens]
    )
    # python-int path unchanged (exactness of q*FPS + r*FPS//SR)
    for n in (0, 1, 15999, 16000, 16001, 127600, 2**40 + 12345):
        assert frame_count(n) == n * 60 // 16000


def test_decoder_step_requires_scratch_row_with_n_valid():
    """make_decoder_step must refuse n_valid without an explicit scratch
    cache row: a defaulted row 0 would be a valid attended position and
    masked-off streams would corrupt the active prefix."""
    from audio2face_tpu.models.decoder_step import make_decoder_step

    with pytest.raises(ValueError, match="t_scratch"):
        make_decoder_step(
            {}, styles=jnp.zeros((2, 64)), t0=jnp.zeros((2,), jnp.int32),
            n_valid=jnp.ones((2,), jnp.int32),
        )


def test_faceformer_parity_vs_naive_loop(pair):
    oracle, model, variables = pair
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)  # 0.5 s -> 30 frames
    one_hot = np.zeros((1, N_ONEHOT), np.float32)
    one_hot[0, 2] = 1.0
    template = rng.normal(size=(1, N_VERTS // 3, 3)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.as_tensor(audio), torch.as_tensor(one_hot), torch.as_tensor(template)
        ).numpy()

    ours = np.asarray(
        model.apply(variables, jnp.asarray(audio), jnp.asarray(one_hot), jnp.asarray(template))
    )
    assert ours.shape == ref.shape == (1, 30, 5023, 3)
    err = np.abs(ours - ref).max()
    assert err < 1e-4, f"max vertex err {err}"


def test_faceformer_batched_padded_decode(pair):
    """Padded batch-2 decode: valid frames of the shorter item must match its
    solo decode (the reference cannot batch at all)."""
    _, model, variables = pair
    rng = np.random.default_rng(1)
    a1 = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)
    a2 = (rng.normal(size=(1, 5600)) * 0.1).astype(np.float32)
    a2_pad = np.concatenate([a2, np.zeros((1, 2400), np.float32)], axis=1)
    one_hot = np.zeros((2, N_ONEHOT), np.float32)
    one_hot[0, 1] = one_hot[1, 5] = 1.0
    template = rng.normal(size=(2, N_VERTS // 3, 3)).astype(np.float32)

    batch_audio = np.concatenate([a1, a2_pad], axis=0)
    out, mask = model.apply(
        variables, jnp.asarray(batch_audio), jnp.asarray(one_hot), jnp.asarray(template),
        lengths=jnp.asarray([8000, 5600]),
    )
    out = np.asarray(out)
    n2 = frame_count(5600)
    assert np.asarray(mask).sum(axis=1).tolist() == [30, n2]

    solo = np.asarray(
        model.apply(
            variables, jnp.asarray(a2), jnp.asarray(one_hot[1:]), jnp.asarray(template[1:])
        )
    )
    # ALL valid frames must meet the repo-wide 1e-4 vertex bar. The masked
    # conv/group-norm stats, per-item fps interp, and kv_lengths attention
    # masking make the padded path agree with solo to ~5e-7 measured (the
    # only seed of divergence left is f32-on-device vs f64-on-host interp
    # weights, ~3e-6 at the latents, attenuated by the 0.02-scale vertex
    # head). No interior-only carve-out: the conv tail sees only explicit
    # zeros, which VALID convs never mix into valid latents.
    err = np.abs(out[1, :n2] - solo[0]).max()
    assert err < 1e-4, f"batched vs solo err {err}"


@pytest.mark.slow
def test_faceformer_train_grad():
    """Gradients flow through the rematerialized scan (the reference
    backprops through the full autoregressive unroll)."""
    n_verts = 300  # small head keeps the CPU backward fast
    model = FaceFormer(n_verts=n_verts, n_onehot=N_ONEHOT)
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=(1, 4000)) * 0.1).astype(np.float32)
    one_hot = np.zeros((1, N_ONEHOT), np.float32)
    one_hot[0, 0] = 1.0
    template = np.zeros((1, n_verts // 3, 3), np.float32)
    target = rng.normal(size=(1, 15, n_verts // 3, 3)).astype(np.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(one_hot), jnp.asarray(template)
    )
    # the zero-init motion maps (faceformer.py:132-135) block gradients into
    # the decoder at exactly step 0; randomize them as training would
    params = dict(variables["params"])
    params["vertice_map_kernel"] = jnp.asarray(rng.normal(0, 0.02, (n_verts, 64)).astype(np.float32))
    params["vertice_map_r_kernel"] = jnp.asarray(rng.normal(0, 0.02, (64, n_verts)).astype(np.float32))
    variables = {"params": params}

    def loss_fn(params):
        out = model.apply(
            {"params": params}, jnp.asarray(audio), jnp.asarray(one_hot),
            jnp.asarray(template), train=True,
            rngs={"dropout": jax.random.PRNGKey(0), "spec_augment": jax.random.PRNGKey(1)},
        )
        return jnp.mean(jnp.square(out - target))

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda x: float(jnp.abs(x).sum()), g))
    assert all(np.isfinite(flat))
    # the decoder weights must receive gradient
    assert float(jnp.abs(g["dec_q_kernel"]).sum()) > 0
    assert float(jnp.abs(g["audio_feature_map_kernel"]).sum()) > 0


def test_faceformer_biwi_mode_parity():
    """dataset="biwi": the reference's OTHER alignment mode (dead code behind
    its hardcoded "vocaset", but present in both vendored branches) — 25 fps
    frames, untouched 50 fps latents (trim branch, wav2vec.py:119-124), and a
    TRUE 2-way cross softmax over latents {2t, 2t+1} (enc_dec_mask BIWI arm,
    faceformer.py:60-62) with live cross q/k projections. Must match the
    torch naive-recompute oracle after checkpoint conversion."""
    from tests.torch_mirrors import TorchFaceFormer

    torch.manual_seed(1)
    oracle = TorchFaceFormer(N_VERTS, N_ONEHOT, dataset="BIWI", period=25)
    with torch.no_grad():
        for lin in (oracle.vertice_map, oracle.vertice_map_r):
            lin.weight.normal_(0, 0.02)
            lin.bias.normal_(0, 0.02)
    oracle.eval()
    variables = jax.tree.map(
        jnp.asarray,
        convert_faceformer(state_dict_to_numpy(oracle), dataset="biwi"),
    )
    model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT, dataset="biwi", period=25)

    rng = np.random.default_rng(3)
    audio = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)  # 12 frames, 24 latents
    one_hot = np.zeros((1, N_ONEHOT), np.float32)
    one_hot[0, 7] = 1.0
    template = rng.normal(size=(1, N_VERTS // 3, 3)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.as_tensor(audio), torch.as_tensor(one_hot), torch.as_tensor(template)
        ).numpy()
    ours = np.asarray(
        model.apply(variables, jnp.asarray(audio), jnp.asarray(one_hot), jnp.asarray(template))
    )
    assert ours.shape == ref.shape == (1, 12, 5023, 3)
    err = np.abs(ours - ref).max()
    assert err < 1e-4, f"max vertex err {err}"


@pytest.mark.slow
def test_biwi_fused_decode_matches_scan():
    """BIWI fused mega-kernel (2-way cross softmax in-kernel) == the scan
    path, end-to-end through the model (interpret-mode Pallas on CPU)."""
    from unittest.mock import patch

    from audio2face_tpu.ops import decode_kernel

    rng = np.random.default_rng(4)
    audio = jnp.asarray((rng.normal(size=(2, 8000)) * 0.1).astype(np.float32))
    one_hot = jnp.asarray(np.eye(N_ONEHOT, dtype=np.float32)[[2, 9]])
    template = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))

    model_scan = FaceFormer(
        n_verts=300, n_onehot=N_ONEHOT, dataset="biwi", period=25,
        decode_impl="scan",
    )
    variables = jax.jit(model_scan.init)(jax.random.PRNGKey(0), audio, one_hot, template)
    params = dict(variables["params"])
    params["vertice_map_kernel"] = jnp.asarray(rng.normal(0, 0.05, (300, 64)).astype(np.float32))
    params["vertice_map_r_kernel"] = jnp.asarray(rng.normal(0, 0.05, (64, 300)).astype(np.float32))
    variables = {"params": params}
    ref = model_scan.apply(variables, audio, one_hot, template)

    orig = decode_kernel.faceformer_decode_loop

    def interp_loop(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    model_fused = FaceFormer(
        n_verts=300, n_onehot=N_ONEHOT, dataset="biwi", period=25,
        decode_impl="fused",
    )
    with patch.object(decode_kernel, "faceformer_decode_loop", interp_loop):
        out = model_fused.apply(variables, audio, one_hot, template)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
