"""Fused multi-head attention for TPU: Pallas flash kernels + XLA reference.

Replaces the reference's cuDNN attention (nn.TransformerDecoder at
src/model/faceformer.py:121-127,174-179 and HF wav2vec2 encoder attention at
src/model/wav2vec.py:174-181) with a single online-softmax flash-attention
kernel supporting, in any combination:

- causal masking,
- the FaceFormer period-bucketed ALiBi bias
  ``bias[h, i, j] = -slope_h * ((i - j) // period)``
  (reference table construction: src/model/faceformer.py:22-54 — here the
  bias is computed on the fly inside the kernel, so there is no O(L^2)
  precomputed mask and no 600-frame cap),
- per-batch KV-length masking for padded batches.

The kernel never materializes the (Tq, Tk) score matrix in HBM — scores live
in VMEM one (block_q, block_k) tile at a time with running max/sum — which is
what lets 60 s utterances (3,600 frames) and long wav2vec2 feature sequences
stay on-chip.

A `decode_step_attention` fast path serves KV-cached autoregressive decode
(one query against a padded cache) inside `lax.scan`.

Gradients: `flash_attention` carries a custom VJP whose backward recomputes
attention with the XLA reference path (rematerialized backward). Training
sequences are short (<= ~600 frames / ~500 audio features), so the O(T^2)
backward buffers are small; the Pallas forward is what matters for long-form
inference.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30


def alibi_slopes(n_heads: int) -> np.ndarray:
    """ALiBi head slopes (reference: src/model/faceformer.py:23-36).

    For power-of-two n: slopes are 2^(-8/n), 2^(-16/n), ... For other n, the
    closest power of two is used and interleaved, per the ALiBi paper.
    """

    def pow2_slopes(n: int) -> list[float]:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        slopes = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        slopes = (
            pow2_slopes(closest)
            + pow2_slopes(2 * closest)[0::2][: n_heads - closest]
        )
    return np.asarray(slopes, dtype=np.float32)


def alibi_period_bias(
    n_heads: int, t_q: int, t_k: int, period: int, q_offset: int = 0
) -> jnp.ndarray:
    """Dense (H, Tq, Tk) bias: -slope_h * ((i - j) // period) on j <= i.

    Equals the reference's precomputed ``init_biased_mask`` alibi term
    (src/model/faceformer.py:38-47) without the -inf causal part.
    """
    slopes = jnp.asarray(alibi_slopes(n_heads))
    i = jnp.arange(t_q)[:, None] + q_offset
    j = jnp.arange(t_k)[None, :]
    dist = jnp.floor_divide(i - j, period)
    return -slopes[:, None, None] * dist[None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    alibi_period: Optional[int] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    q_offset: int = 0,
) -> jnp.ndarray:
    """Plain-XLA multi-head attention. q,k,v: (B, H, T, D)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale

    i = jnp.arange(t_q)[:, None] + q_offset
    j = jnp.arange(t_k)[None, :]
    if alibi_period is not None:
        slopes = jnp.asarray(alibi_slopes(h))
        dist = jnp.floor_divide(i - j, alibi_period).astype(jnp.float32)
        s = s - slopes[None, :, None, None] * dist[None, None]
    mask = jnp.ones((t_q, t_k), dtype=bool)
    if causal:
        mask = mask & (j <= i)
    mask = jnp.broadcast_to(mask[None, None], (b, h, t_q, t_k))
    if kv_lengths is not None:
        mask = mask & (j[None, None] < kv_lengths[:, None, None, None])
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    kvlen_ref,  # SMEM (B*H,) int32  [scalar prefetch]
    slope_ref,  # SMEM (B*H,) f32    [scalar prefetch]
    q_ref,  # VMEM (1, block_q, d_pad)
    k_ref,  # VMEM (1, block_k, d_pad)
    v_ref,  # VMEM (1, block_k, d_pad)
    o_ref,  # VMEM (1, block_q, d_pad)
    m_scr,  # VMEM (block_q, 128) f32
    l_scr,  # VMEM (block_q, 128) f32
    acc_scr,  # VMEM (block_q, d_pad) f32
    *,
    causal: bool,
    alibi_period: Optional[int],
    sm_scale: float,
    block_q: int,
    block_k: int,
    n_k_blocks: int,
    precision: jax.lax.Precision,
    may_mask: bool,
):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)

    kvlen = kvlen_ref[bh]
    # Last KV block that can contribute to this q block: bounded by the KV
    # length and, under causality, by the final query row of the block.
    len_bound = jax.lax.div(jnp.maximum(kvlen - 1, 0), block_k)
    last_needed = jnp.minimum(n_k_blocks - 1, len_bound)
    if causal:
        causal_bound = (iq * block_q + block_q - 1) // block_k
        last_needed = jnp.minimum(last_needed, causal_bound)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(ik <= last_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        s = s * sm_scale

        needs_idx = causal or (alibi_period is not None) or may_mask
        if needs_idx:
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if alibi_period is not None:
            slope = slope_ref[bh]
            # floor division (reference uses torch // which floors toward -inf;
            # lax integer div truncates, so correct negative remainders)
            d = row - col
            qd = jax.lax.div(d, alibi_period)
            rd = d - qd * alibi_period
            qd = qd - jnp.logical_and(rd != 0, d < 0).astype(jnp.int32)
            s = s - slope * qd.astype(jnp.float32)
        if needs_idx:
            mask = col < kvlen
            if causal:
                mask = jnp.logical_and(mask, col <= row)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == last_needed)
    def _finalize():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    alibi_period: Optional[int] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas flash attention. q,k,v: (B, H, Tq/Tk, D) -> (B, H, Tq, D)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    out_dtype = q.dtype

    # lane padding: multiples of 64 are Mosaic-supported; 64 halves the
    # memory traffic vs padding to 128 for the common head_dim=64 case
    d_pad = max(_round_up(d, 64), 64)
    block_q = min(block_q, _round_up(t_q, 8))
    block_k = min(block_k, _round_up(t_k, 128))
    t_q_pad = _round_up(t_q, block_q)
    t_k_pad = _round_up(t_k, block_k)

    def pad(x, t_pad):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]), (0, d_pad - d))
        ).reshape(b * h, t_pad, d_pad)

    qf = pad(q, t_q_pad)
    kf = pad(k, t_k_pad)
    vf = pad(v, t_k_pad)

    if kv_lengths is None:
        kvlen = jnp.full((b,), t_k, dtype=jnp.int32)
    else:
        kvlen = kv_lengths.astype(jnp.int32)
    kvlen_bh = jnp.repeat(kvlen, h)
    slopes_bh = jnp.tile(jnp.asarray(alibi_slopes(h)), b)

    n_q_blocks = t_q_pad // block_q
    n_k_blocks = t_k_pad // block_k

    # f32 inputs keep full f32 MXU passes for the <1e-4 parity target;
    # bf16 inputs use the native bf16 MXU path.
    precision = (
        jax.lax.Precision.DEFAULT
        if q.dtype in (jnp.bfloat16, jnp.float16)
        else jax.lax.Precision.HIGHEST
    )
    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        alibi_period=alibi_period,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        n_k_blocks=n_k_blocks,
        precision=precision,
        # masking work is skipped entirely when no key can be invalid
        may_mask=kv_lengths is not None or t_k_pad != t_k,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b * h, n_q_blocks, n_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *refs: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *refs: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *refs: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *refs: (bh, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t_q_pad, d_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q * t_k * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * t_q * t_k,
        ),
        interpret=interpret,
    )(kvlen_bh, slopes_bh, qf, kf, vf)

    return out.reshape(b, h, t_q_pad, d_pad)[:, :, :t_q, :d]


# ---------------------------------------------------------------------------
# Dispatcher with custom VJP (Pallas forward, XLA rematerialized backward)
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 6, 7)
)
def _flash_attention_ad(q, k, v, causal, alibi_period, kv_lengths, sm_scale, interpret):
    return flash_attention_pallas(
        q,
        k,
        v,
        causal=causal,
        alibi_period=alibi_period,
        kv_lengths=kv_lengths,
        sm_scale=sm_scale,
        interpret=interpret,
    )


def _flash_fwd(q, k, v, causal, alibi_period, kv_lengths, sm_scale, interpret):
    out = _flash_attention_ad(q, k, v, causal, alibi_period, kv_lengths, sm_scale, interpret)
    return out, (q, k, v, kv_lengths)


def _flash_bwd(causal, alibi_period, sm_scale, interpret, residuals, g):
    q, k, v, kv_lengths = residuals

    def ref(q, k, v, kv_lengths):
        return mha_reference(
            q, k, v, causal=causal, alibi_period=alibi_period,
            kv_lengths=kv_lengths, sm_scale=sm_scale,
        )

    _, vjp = jax.vjp(ref, q, k, v, kv_lengths)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    alibi_period: Optional[int] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MHA. q,k,v: (B, H, T, D). Auto-selects the Pallas kernel on TPU
    and the XLA reference elsewhere (both are numerically equivalent)."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return _flash_attention_ad(
            q, k, v, causal, alibi_period, kv_lengths,
            sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1]),
            interpret,
        )
    return mha_reference(
        q, k, v, causal=causal, alibi_period=alibi_period,
        kv_lengths=kv_lengths, sm_scale=sm_scale,
    )


# ---------------------------------------------------------------------------
# KV-cached single-step decode attention
# ---------------------------------------------------------------------------


def decode_step_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    step: jnp.ndarray,
    *,
    alibi_period: Optional[int] = None,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """One autoregressive decode step against a padded KV cache.

    q: (B, H, D) — the query at position ``step``.
    k_cache/v_cache: (B, H, Tmax, D), valid on [0, step].
    step: scalar int32 (same position for the whole batch).

    Implements exactly the attention the reference's O(T^2)-recompute loop
    (src/model/faceformer.py:154-185) performs for the newest position —
    causal over the prefix with the period-bucketed ALiBi bias — in O(T).

    This is a fused XLA path: at decoder scale (H=4, D=16) the step is a
    skinny matvec that XLA fuses into a single VMEM-resident kernel; scores
    are never materialized in HBM.
    """
    b, hh, t_max, d = k_cache.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhd,bhkd->bhk", q, k_cache, preferred_element_type=jnp.float32)
    s = s * sm_scale
    j = jnp.arange(t_max)[None, None, :]
    if alibi_period is not None:
        slopes = jnp.asarray(alibi_slopes(hh))
        dist = jnp.floor_divide(step - j, alibi_period).astype(jnp.float32)
        s = s - slopes[None, :, None] * dist
    s = jnp.where(j <= step, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhk,bhkd->bhd", p.astype(v_cache.dtype), v_cache)
