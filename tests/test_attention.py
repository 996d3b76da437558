import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audio2face_tpu.ops.attention import (
    alibi_period_bias,
    alibi_slopes,
    decode_step_attention,
    flash_attention_pallas,
    mha_reference,
)


def test_alibi_slopes_match_reference_construction():
    """slopes for 4 heads are [2^-2, 2^-4, 2^-6, 2^-8]
    (reference get_slopes: src/model/faceformer.py:23-36)."""
    np.testing.assert_allclose(alibi_slopes(4), [0.25, 0.0625, 0.015625, 0.00390625])
    assert len(alibi_slopes(6)) == 6


def torch_reference_biased_mask(n_head, max_seq_len, period):
    """Independent transcription of the reference init_biased_mask semantics:
    mask[h, i, j] = -inf for j > i else -slope_h * ((i - j) // period)."""
    slopes = torch.as_tensor(np.asarray(alibi_slopes(n_head)))
    i = torch.arange(max_seq_len)[:, None]
    j = torch.arange(max_seq_len)[None, :]
    alibi = torch.where(j <= i, -((i - j) // period).float(), torch.zeros(()))
    mask = torch.where(j <= i, torch.zeros(()), torch.full((), float("-inf")))
    return slopes[:, None, None] * alibi[None] + mask[None]


def test_alibi_period_bias_matches_reference_table():
    T, period = 130, 60
    bias = np.asarray(alibi_period_bias(4, T, T, period))
    ref = torch_reference_biased_mask(4, T, period).numpy()
    # compare on the causal (finite) region only
    tril = np.tril_indices(T)
    for h in range(4):
        np.testing.assert_allclose(bias[h][tril], ref[h][tril], atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("alibi_period", [None, 60])
def test_reference_attention_matches_torch_sdpa(causal, alibi_period):
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 37, 16
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)

    ours = np.asarray(
        mha_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            causal=causal, alibi_period=alibi_period,
        )
    )

    attn_mask = torch.zeros(h, t, t)
    if alibi_period is not None:
        attn_mask = torch_reference_biased_mask(h, t, alibi_period)
        if not causal:
            # keep only the alibi part (finite everywhere)
            i = torch.arange(t)[:, None]
            j = torch.arange(t)[None, :]
            slopes = torch.as_tensor(np.asarray(alibi_slopes(h)))
            attn_mask = -slopes[:, None, None] * torch.div(i - j, 60, rounding_mode="floor").float()[None]
    elif causal:
        attn_mask = torch.where(
            torch.arange(t)[None, :] <= torch.arange(t)[:, None], 0.0, float("-inf")
        ).expand(h, t, t)
    if causal and alibi_period is not None:
        pass  # torch_reference_biased_mask already includes -inf causal part

    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.as_tensor(q), torch.as_tensor(k), torch.as_tensor(v),
        attn_mask=attn_mask[None].expand(b, h, t, t),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("alibi_period", [None, 60])
@pytest.mark.parametrize("t_q,t_k,d", [(37, 37, 16), (130, 130, 64), (8, 200, 64)])
def test_pallas_flash_matches_reference(causal, alibi_period, t_q, t_k, d):
    if causal and t_q != t_k:
        pytest.skip("causal requires square")
    rng = np.random.default_rng(1)
    b, h = 2, 4
    q = jnp.asarray(rng.normal(size=(b, h, t_q, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t_k, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t_k, d)).astype(np.float32))

    ref = mha_reference(q, k, v, causal=causal, alibi_period=alibi_period)
    ours = flash_attention_pallas(
        q, k, v, causal=causal, alibi_period=alibi_period,
        block_q=64, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_flash_kv_lengths():
    rng = np.random.default_rng(2)
    b, h, t, d = 3, 2, 100, 32
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([100, 57, 3], dtype=jnp.int32)

    ref = mha_reference(q, k, v, kv_lengths=lengths)
    ours = flash_attention_pallas(q, k, v, kv_lengths=lengths, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_decode_step_matches_full_attention():
    """KV-cached single-step decode == row `t` of full causal+alibi attention."""
    rng = np.random.default_rng(3)
    b, h, t_max, d = 2, 4, 64, 16
    q_all = jnp.asarray(rng.normal(size=(b, h, t_max, d)).astype(np.float32))
    k_all = jnp.asarray(rng.normal(size=(b, h, t_max, d)).astype(np.float32))
    v_all = jnp.asarray(rng.normal(size=(b, h, t_max, d)).astype(np.float32))

    full = mha_reference(q_all, k_all, v_all, causal=True, alibi_period=60)

    for step in [0, 1, 33, 63]:
        out = decode_step_attention(
            q_all[:, :, step], k_all, v_all, jnp.asarray(step), alibi_period=60
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full[:, :, step]), rtol=1e-4, atol=1e-5,
        )


def test_flash_attention_grad_flows():
    from audio2face_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))

    def loss(q):
        return jnp.sum(flash_attention(q, q, q, causal=True, use_pallas=False))

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_forward_lse(allclose=np.testing.assert_allclose):
    """return_lse emits the per-row logsumexp of the (biased, masked) scores."""
    from audio2face_tpu.ops.attention import flash_attention_pallas

    rng = np.random.default_rng(5)
    b, h, t, d = 1, 2, 37, 16
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    out, lse = flash_attention_pallas(
        q, q, q, causal=True, alibi_period=60, block_q=32, block_k=32,
        interpret=True, return_lse=True,
    )
    # direct lse
    import math

    s = np.einsum("bhqd,bhkd->bhqk", q, q) / math.sqrt(d)
    from audio2face_tpu.ops.attention import alibi_period_bias

    s = s + np.asarray(alibi_period_bias(h, t, t, 60))[None]
    i, j = np.arange(t)[:, None], np.arange(t)[None, :]
    s = np.where((j <= i)[None, None], s, -1e30)
    ref = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)[..., None][..., 0]
    allclose(np.asarray(lse), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("alibi_period", [None, 60])
@pytest.mark.parametrize("t,d", [(37, 16), (100, 64)])
def test_pallas_backward_matches_xla_grad(causal, alibi_period, t, d):
    """Pallas dq/dk/dv kernels vs jax.grad of the XLA reference."""
    from audio2face_tpu.ops.attention import (
        flash_attention_bwd_pallas,
        flash_attention_pallas,
    )

    rng = np.random.default_rng(6)
    b, h = 2, 3
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    def ref(q, k, v):
        return mha_reference(q, k, v, causal=causal, alibi_period=alibi_period)

    _, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    out, lse = flash_attention_pallas(
        q, k, v, causal=causal, alibi_period=alibi_period,
        block_q=32, block_k=64, interpret=True, return_lse=True,
    )
    dq, dk, dv = flash_attention_bwd_pallas(
        q, k, v, out, lse, g, causal=causal, alibi_period=alibi_period,
        block_q=32, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-3, atol=2e-4)


def test_pallas_backward_kv_lengths():
    from audio2face_tpu.ops.attention import (
        flash_attention_bwd_pallas,
        flash_attention_pallas,
    )

    rng = np.random.default_rng(7)
    b, h, t, d = 2, 2, 50, 32
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([50, 23], jnp.int32)

    def ref(q, k, v):
        return mha_reference(q, k, v, kv_lengths=lengths)

    _, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    out, lse = flash_attention_pallas(
        q, k, v, kv_lengths=lengths, block_q=32, block_k=32, interpret=True, return_lse=True
    )
    dq, dk, dv = flash_attention_bwd_pallas(
        q, k, v, out, lse, g, kv_lengths=lengths, block_q=32, block_k=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-3, atol=2e-4)


def _hash_keep_mask(seed, b, h, t_q, t_k, rate):
    """The kernels' dropout mask, recomputed outside Pallas: the keep bit is
    a pure function of (seed, batch*head, row, col), so tests can build the
    exact mask and pin the in-kernel dropout against a masked XLA oracle."""
    from audio2face_tpu.ops.attention import _dropout_keep_tile

    row = jnp.arange(t_q, dtype=jnp.int32)[:, None] * jnp.ones((1, t_k), jnp.int32)
    col = jnp.arange(t_k, dtype=jnp.int32)[None, :] * jnp.ones((t_q, 1), jnp.int32)
    masks = [
        _dropout_keep_tile(jnp.int32(seed), jnp.int32(bh), row, col, rate)
        for bh in range(b * h)
    ]
    return jnp.stack(masks).reshape(b, h, t_q, t_k)


def _mha_with_explicit_keep(q, k, v, keep, *, causal=False, alibi_period=None,
                            kv_lengths=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s = s / math.sqrt(q.shape[-1])
    t_q, t_k = q.shape[2], k.shape[2]
    i = jnp.arange(t_q)[:, None]
    j = jnp.arange(t_k)[None, :]
    if alibi_period is not None:
        slopes = jnp.asarray(alibi_slopes(q.shape[1]))
        dist = jnp.floor_divide(i - j, alibi_period).astype(jnp.float32)
        s = s - slopes[None, :, None, None] * dist[None, None]
    mask = jnp.ones((t_q, t_k), bool)
    if causal:
        mask = mask & (j <= i)
    mask = jnp.broadcast_to(mask[None, None], s.shape)
    if kv_lengths is not None:
        mask = mask & (j[None, None] < kv_lengths[:, None, None, None])
    s = jnp.where(mask, s, -2.3819763e38)
    p = jax.nn.softmax(s, axis=-1) * keep
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      precision=jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("causal,alibi_period", [(False, None), (True, 60)])
def test_pallas_dropout_forward_matches_masked_oracle(causal, alibi_period):
    """In-kernel attention dropout == the XLA oracle given the SAME keep
    mask (recomputed from the deterministic coordinate hash)."""
    from audio2face_tpu.ops.attention import flash_attention_pallas

    rng = np.random.default_rng(11)
    b, h, t, d = 2, 2, 80, 32
    rate, seed = 0.1, 1234
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    keep = _hash_keep_mask(seed, b, h, t, t, rate)
    # sanity: the hash actually drops ~rate of positions and is not constant
    frac = float((keep == 0).mean())
    assert 0.05 < frac < 0.16, frac

    want = _mha_with_explicit_keep(q, k, v, keep, causal=causal,
                                   alibi_period=alibi_period)
    got = flash_attention_pallas(
        q, k, v, causal=causal, alibi_period=alibi_period,
        block_q=32, block_k=32, interpret=True,
        dropout_rate=rate, dropout_seed=jnp.asarray([seed], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # rate=0 with a seed is exactly the no-dropout kernel
    a = flash_attention_pallas(q, k, v, causal=causal, alibi_period=alibi_period,
                               block_q=32, block_k=32, interpret=True)
    bb = flash_attention_pallas(q, k, v, causal=causal, alibi_period=alibi_period,
                                block_q=32, block_k=32, interpret=True,
                                dropout_rate=0.0,
                                dropout_seed=jnp.asarray([seed], jnp.int32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_pallas_dropout_backward_matches_masked_oracle():
    """The backward kernels regenerate the forward's exact mask: dq/dk/dv
    equal jax.grad of the explicitly-masked XLA oracle."""
    from audio2face_tpu.ops.attention import (
        flash_attention_bwd_pallas,
        flash_attention_pallas,
    )

    rng = np.random.default_rng(12)
    b, h, t, d = 2, 2, 64, 32
    rate, seed = 0.1, 777
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    lengths = jnp.asarray([64, 40], jnp.int32)

    keep = _hash_keep_mask(seed, b, h, t, t, rate)

    def ref(q, k, v):
        return _mha_with_explicit_keep(q, k, v, keep, causal=True,
                                       kv_lengths=lengths)

    _, vjp = jax.vjp(ref, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    seed_arr = jnp.asarray([seed], jnp.int32)
    out, lse = flash_attention_pallas(
        q, k, v, causal=True, kv_lengths=lengths,
        block_q=32, block_k=32, interpret=True, return_lse=True,
        dropout_rate=rate, dropout_seed=seed_arr,
    )
    dq, dk, dv = flash_attention_bwd_pallas(
        q, k, v, out, lse, g, causal=True, kv_lengths=lengths,
        block_q=32, block_k=32, interpret=True,
        dropout_rate=rate, dropout_seed=seed_arr,
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-3, atol=2e-4)
