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
from audio2face_tpu.utils.shapes import round_up as _round_up

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


def _dot_precision(dtype) -> jax.lax.Precision:
    """f32 inputs keep full f32 MXU passes (the <1e-4 parity bar); bf16/f16
    inputs use the native fast path. TPU's DEFAULT precision truncates f32
    matmul inputs to bf16, which silently costs ~1e-2 accuracy."""
    return (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16))
        else jax.lax.Precision.HIGHEST
    )


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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain-XLA multi-head attention. q,k,v: (B, H, T, D).

    ``dropout_rate``/``dropout_rng`` apply torch-style attention-probability
    dropout (drop softmax weights, scale survivors by 1/(1-p)) — the
    regularization HF wav2vec2 uses in training (attention_dropout=0.1)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    precision = _dot_precision(q.dtype)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k,
        preferred_element_type=jnp.float32, precision=precision,
    )
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
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, precision=precision
    )


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _dropout_keep_tile(seed, bh, row, col, rate):
    """Deterministic per-position dropout keep-multiplier tile.

    A counter-based integer hash of (seed, batch*head, global row, global
    col) — murmur3-style finalizer over plain int32 vector ops, so the SAME
    mask is regenerated exactly in the forward and both backward kernels
    from coordinates alone (no block-size coupling, no saved mask tensor)
    and the code runs identically under the CPU interpreter (the TPU-native
    ``pltpu.prng_*`` has no interpret lowering). Returns 0 or 1/(1-rate)
    as f32. Quality is ample for dropout: 3 avalanche rounds over a 96-bit
    counter.
    """
    h = (
        row * jnp.int32(-1640531527)  # 0x9E3779B9 (golden-ratio odd)
        ^ col * jnp.int32(-2048144789)  # 0x85EBCA6B (murmur3 c1)
        ^ (seed + bh * jnp.int32(-1028477387))  # 0xC2B2AE35 (murmur3 c2)
    )
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(0x7FEB352D)
    h = h ^ jax.lax.shift_right_logical(h, 15)
    h = h * jnp.int32(-2090600430)  # 0x835A13CB
    h = h ^ jax.lax.shift_right_logical(h, 16)
    # uniform in [0, 2^31) after clearing the sign bit
    u = h & jnp.int32(0x7FFFFFFF)
    thr = jnp.int32(min(int(rate * float(1 << 31)), (1 << 31) - 1))
    return jnp.where(u >= thr, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


def _flash_kernel(
    kvlen_ref,  # SMEM (B*H,) int32  [scalar prefetch]
    slope_ref,  # SMEM (B*H,) f32    [scalar prefetch]
    seed_ref,  # SMEM (1,) int32    [scalar prefetch; dropout hash seed]
    q_ref,  # VMEM (1, block_q, d_pad)
    k_ref,  # VMEM (1, block_k, d_pad)
    v_ref,  # VMEM (1, block_k, d_pad)
    o_ref,  # VMEM (1, block_q, d_pad)
    lse_ref,  # VMEM (1, block_q, 128) f32 — logsumexp per row, lane-broadcast
              # (Mosaic tiling requires the trailing 128 lanes)
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
    q_chunks: int = 1,
    dropout_rate: float = 0.0,
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

    # Optionally process the q block in independent row chunks (the chunks
    # share no data, giving the scheduler a chance to overlap chunk B's score
    # matmul with chunk A's softmax). Measured neutral-to-negative on v5e —
    # Mosaic serializes anyway — so the default is one monolithic chunk; the
    # knob is kept for future hardware.
    if block_q % (q_chunks * 8) != 0:
        q_chunks = 1
    rows = block_q // q_chunks
    n_chunks = q_chunks

    @pl.when(ik <= last_needed)
    def _compute():
        k = k_ref[0]
        v = v_ref[0]
        # power-of-2 scales are folded into q exactly (block_q x d elements);
        # other scales apply to the (block_q, block_k) scores
        fold_scale = math.log2(sm_scale).is_integer() if sm_scale > 0 else False

        def accumulate(s, r0):
            """Online-softmax update for rows [r0, r0+rows)."""
            sl = slice(r0, r0 + rows)
            m_prev = m_scr[sl, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_scr[sl, :1] + jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                # torch semantics: dropout on the NORMALIZED probabilities,
                # i.e. the softmax denominator (l) sums undropped p while
                # the value accumulation uses the masked p
                r_ = (
                    iq * block_q + r0
                    + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0)
                )
                c_ = ik * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, block_k), 1
                )
                pv = p * _dropout_keep_tile(seed_ref[0], bh, r_, c_, dropout_rate)
            else:
                pv = p
            acc_scr[sl] = acc_scr[sl] * alpha + jax.lax.dot_general(
                pv.astype(v.dtype),
                v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            m_scr[sl] = jnp.broadcast_to(m_new, (rows, m_scr.shape[1]))
            l_scr[sl] = jnp.broadcast_to(l_new, (rows, l_scr.shape[1]))

        def masked_body(s, r0):
            row = (
                iq * block_q + r0
                + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0)
            )
            col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
            sm = s
            if alibi_period is not None:
                slope = slope_ref[bh]
                # floor division (reference uses torch // which floors toward
                # -inf; lax integer div truncates — correct negative remainders)
                d = row - col
                qd = jax.lax.div(d, alibi_period)
                rd = d - qd * alibi_period
                qd = qd - jnp.logical_and(rd != 0, d < 0).astype(jnp.int32)
                sm = sm - slope * qd.astype(jnp.float32)
            mask = col < kvlen
            if causal:
                mask = jnp.logical_and(mask, col <= row)
            accumulate(jnp.where(mask, sm, DEFAULT_MASK_VALUE), r0)

        for c in range(n_chunks):
            r0 = c * rows
            q = q_ref[0, r0 : r0 + rows]
            if fold_scale:
                q = q * jnp.asarray(sm_scale, q.dtype)
            s = jax.lax.dot_general(
                q,
                k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            if not fold_scale:
                s = s * sm_scale

            if alibi_period is not None:
                # the bias touches every (row, col) — no mask-free fast path
                masked_body(s, r0)
            elif causal or may_mask:
                # index/compare/select passes over the score tile are a large
                # share of the VPU time; run them only on blocks that can
                # contain an invalid column (tail of the KV length / diagonal
                # crossers) — interior blocks take the 3-pass fast path
                needs = (ik + 1) * block_k > kvlen
                if causal:
                    needs = jnp.logical_or(
                        needs, (ik + 1) * block_k - 1 > iq * block_q + r0
                    )
                pl.when(needs)(functools.partial(masked_body, s, r0))
                pl.when(jnp.logical_not(needs))(
                    functools.partial(accumulate, s, r0)
                )
            else:
                accumulate(s, r0)

    @pl.when(ik == last_needed)
    def _finalize():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(jnp.maximum(l_scr[:], 1e-30))


def flash_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    alibi_period: Optional[int] = None,
    kv_lengths: Optional[jnp.ndarray] = None,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    q_chunks: int = 1,
    interpret: bool = False,
    return_lse: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pallas flash attention. q,k,v: (B, H, Tq/Tk, D) -> (B, H, Tq, D).

    ``return_lse`` additionally returns the per-row logsumexp (B, H, Tq) —
    the residual the Pallas backward needs.

    ``dropout_rate``/``dropout_seed`` apply torch-style attention-probability
    dropout in-kernel: each position's keep bit is a deterministic hash of
    (seed, batch*head, row, col), so the backward kernels regenerate the
    identical mask from coordinates — nothing (T, T)-sized ever exists."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    out_dtype = q.dtype

    # lane padding: multiples of 64 are Mosaic-supported; 64 halves the
    # memory traffic vs padding to 128 for the common head_dim=64 case
    d_pad = max(_round_up(d, 64), 64)
    if block_k is None:
        # pick the k-block count that minimizes tail padding with blocks
        # capped at ~2048 (VMEM) — e.g. T=3600 -> 2 blocks of 1824 (1.3% pad)
        n_kb = max(1, -(-t_k // 2048))
        block_k = _round_up(-(-t_k // n_kb), 64)
    block_k = min(block_k, _round_up(t_k, 128))
    if block_q is None:
        # whole-q blocks when the f32 score tile fits comfortably in VMEM:
        # fewer programs amortize fixed per-program cost, and t_q_pad == t_q
        # eliminates padded-row work (measured ~15% at T=3600, d=64)
        # rounded to 32 so the kernel's 4-way row-chunk split divides evenly
        block_q = max(1024, min((8 * 1024 * 1024) // block_k, 4096))
        block_q = min(block_q, _round_up(t_q, 32))
    else:
        block_q = min(block_q, _round_up(t_q, 8))
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
        q_chunks=q_chunks,
        dropout_rate=dropout_rate,
    )
    seed = (
        jnp.zeros((1,), jnp.int32)
        if dropout_seed is None
        else dropout_seed.reshape(1).astype(jnp.int32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, n_q_blocks, n_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *refs: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *refs: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *refs: (bh, ik, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *refs: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *refs: (bh, iq, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_q_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((b * h, t_q_pad, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the (block_q, block_k) f32 score tile dominates scoped VMEM;
            # leave generous headroom so large-block configs compile
            vmem_limit_bytes=min(
                max(64 * 1024 * 1024, 12 * block_q * block_k), 110 * 1024 * 1024
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q * t_k * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * t_q * t_k,
        ),
        interpret=interpret,
    )(kvlen_bh, slopes_bh, seed, qf, kf, vf)

    out = out.reshape(b, h, t_q_pad, d_pad)[:, :, :t_q, :d]
    if return_lse:
        return out, lse[:, :, 0].reshape(b, h, t_q_pad)[:, :, :t_q]
    return out


# ---------------------------------------------------------------------------
# Pallas backward kernels (flash attention dq / dk,dv)
# ---------------------------------------------------------------------------


def _bias_and_mask(s, row, col, kvlen, slope, *, causal, alibi_period, may_mask):
    """Shared score post-processing for the backward kernels: returns the
    biased scores and the validity mask (None when nothing can be masked)."""
    if alibi_period is not None:
        d = row - col
        qd = jax.lax.div(d, alibi_period)
        rd = d - qd * alibi_period
        qd = qd - jnp.logical_and(rd != 0, d < 0).astype(jnp.int32)
        s = s - slope * qd.astype(jnp.float32)
    mask = None
    if causal or may_mask:
        mask = col < kvlen
        if causal:
            mask = jnp.logical_and(mask, col <= row)
    return s, mask


def _flash_bwd_dkdv_kernel(
    kvlen_ref, slope_ref, seed_ref,
    q_ref,  # (1, block_q, d_pad)
    k_ref,  # (1, block_k, d_pad)
    v_ref,  # (1, block_k, d_pad)
    do_ref,  # (1, block_q, d_pad)
    lse_ref,  # (1, block_q, 128) lane-broadcast
    delta_ref,  # (1, block_q, 128) lane-broadcast; D = rowsum(dO * O)
    dk_ref,  # (1, block_k, d_pad)
    dv_ref,  # (1, block_k, d_pad)
    dk_scr, dv_scr,
    *,
    causal, alibi_period, sm_scale, block_q, block_k, n_q_blocks, precision, may_mask,
    q_len, dropout_rate=0.0,
):
    bh = pl.program_id(0)
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    kvlen = kvlen_ref[bh]

    # under causality, q blocks strictly above this k block contribute nothing
    first_needed = (ik * block_k) // block_q if causal else 0

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(iq >= first_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]  # (block_q, 1)
        delta = delta_ref[0][:, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * sm_scale
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        slope = slope_ref[bh] if alibi_period is not None else None
        s, mask = _bias_and_mask(
            s, row, col, kvlen, slope,
            causal=causal, alibi_period=alibi_period, may_mask=may_mask,
        )
        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        if q_len % block_q != 0:
            # padded q rows carry lse=0 and could overflow exp; their dO/D are
            # zero but inf * 0 = NaN, so zero p explicitly
            p = jnp.where(row < q_len, p, 0.0)

        # dv += (m.p)^T dO ; ds = p * (m.(dO v^T) - D) * scale ; dk += ds^T q
        # (m = dropout keep-multiplier; with dropout, out = (m.P) V so
        # D = rowsum(dO * out) already equals sum_k P m dp — the delta
        # term is unchanged, dp is masked, l/lse never see the mask)
        if dropout_rate > 0.0:
            m_keep = _dropout_keep_tile(seed_ref[0], bh, row, col, dropout_rate)
            pv = p * m_keep
        else:
            pv = p
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            pv.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if dropout_rate > 0.0:
            dp = dp * m_keep
        ds = p * (dp - delta) * sm_scale
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(iq == n_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    kvlen_ref, slope_ref, seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *,
    causal, alibi_period, sm_scale, block_q, block_k, n_k_blocks, precision, may_mask,
    dropout_rate=0.0,
):
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    kvlen = kvlen_ref[bh]

    len_bound = jax.lax.div(jnp.maximum(kvlen - 1, 0), block_k)
    last_needed = jnp.minimum(n_k_blocks - 1, len_bound)
    if causal:
        last_needed = jnp.minimum(last_needed, (iq * block_q + block_q - 1) // block_k)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(ik <= last_needed)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * sm_scale
        row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        slope = slope_ref[bh] if alibi_period is not None else None
        s, mask = _bias_and_mask(
            s, row, col, kvlen, slope,
            causal=causal, alibi_period=alibi_period, may_mask=may_mask,
        )
        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        if dropout_rate > 0.0:
            dp = dp * _dropout_keep_tile(seed_ref[0], bh, row, col, dropout_rate)
        ds = p * (dp - delta) * sm_scale
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(ik == jnp.maximum(last_needed, 0))
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def flash_attention_bwd_pallas(
    q, k, v, out, lse, g,
    *,
    causal=False, alibi_period=None, kv_lengths=None, sm_scale=None,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
    interpret: bool = False,
    dropout_rate: float = 0.0, dropout_seed: Optional[jnp.ndarray] = None,
):
    """Pallas flash-attention backward: returns (dq, dk, dv).

    With ``dropout_rate`` > 0 the kernels regenerate the forward's exact
    keep mask from (dropout_seed, batch*head, row, col) — see
    ``_dropout_keep_tile``.

    Default block sizes minimize tail padding like the forward (a fixed
    512 block turned the encoder's T=600 into T=1024 — 70% padded rows in
    BOTH backward kernels, measured 19.4 ms/step of the bs=8 faceformer
    train step vs 3.5 ms for the forward)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    d_pad = max(_round_up(d, 64), 64)
    if block_q is None:
        # blocks capped at ~1024 (f32 score tile <= 4 MB VMEM), sized to the
        # sequence so the tail block is nearly full; multiples of 32 keep
        # bf16 (16, 128) tiling happy
        n_qb = max(1, -(-t_q // 1024))
        block_q = _round_up(-(-t_q // n_qb), 32)
    else:
        block_q = min(block_q, _round_up(t_q, 8))
    if block_k is None:
        n_kb = max(1, -(-t_k // 1024))
        block_k = _round_up(-(-t_k // n_kb), 128)
    block_k = min(block_k, _round_up(t_k, 128))
    t_q_pad = _round_up(t_q, block_q)
    t_k_pad = _round_up(t_k, block_k)

    def pad(x, t_pad):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]), (0, d_pad - d))
        ).reshape(b * h, t_pad, d_pad)

    qf, dof = pad(q, t_q_pad), pad(g, t_q_pad)
    kf, vf = pad(k, t_k_pad), pad(v, t_k_pad)
    # D = rowsum(dO * O); padded rows give 0. Both D and lse are stored
    # lane-broadcast to 128 (Mosaic tiling).
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, t_q_pad - t_q))).reshape(b * h, t_q_pad)
    delta = jnp.broadcast_to(delta[..., None], (b * h, t_q_pad, 128))
    lse_f = jnp.pad(lse, ((0, 0), (0, 0), (0, t_q_pad - t_q))).reshape(b * h, t_q_pad)
    lse_f = jnp.broadcast_to(lse_f[..., None], (b * h, t_q_pad, 128))

    if kv_lengths is None:
        kvlen = jnp.full((b,), t_k, dtype=jnp.int32)
    else:
        kvlen = kv_lengths.astype(jnp.int32)
    kvlen_bh = jnp.repeat(kvlen, h)
    slopes_bh = jnp.tile(jnp.asarray(alibi_slopes(h)), b)

    n_q_blocks = t_q_pad // block_q
    n_k_blocks = t_k_pad // block_k
    precision = (
        jax.lax.Precision.DEFAULT
        if q.dtype in (jnp.bfloat16, jnp.float16)
        else jax.lax.Precision.HIGHEST
    )
    # padded q rows beyond t_q must not contribute to dk/dv: their p would be
    # exp(0 - 0) = 1 without masking, so always mask in the dkdv pass when
    # rows are padded — done by extending the causal/may_mask path with the
    # row-validity test folded into `col < kvlen`? No: rows are on the other
    # axis. Instead zero their dO and ds via delta/do padding: dO rows are
    # zero-padded, so dv += p^T dO gets 0, and ds = p * (0 - 0) = 0. Safe.
    common = dict(
        causal=causal, alibi_period=alibi_period, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k, precision=precision,
        may_mask=kv_lengths is not None or t_k_pad != t_k,
        dropout_rate=dropout_rate,
    )
    seed = (
        jnp.zeros((1,), jnp.int32)
        if dropout_seed is None
        else dropout_seed.reshape(1).astype(jnp.int32)
    )

    dkdv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, n_k_blocks, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, ik, iq, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ik, iq, *r: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ik, iq, *r: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, ik, iq, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, ik, iq, *r: (bh, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ik, iq, *r: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, ik, iq, *r: (bh, ik, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkdv_kernel, n_q_blocks=n_q_blocks, q_len=t_q, **common
        ),
        grid_spec=dkdv_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_k_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_k_pad, d_pad), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # same headroom formula as the forward: the backward holds f32
            # score + dp + ds tiles of (block_q, block_k), and the
            # auto-sized blocks can reach 1024x1024 (~12 MB scoped) —
            # past the default Mosaic limit
            vmem_limit_bytes=min(
                max(64 * 1024 * 1024, 12 * block_q * block_k), 110 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(kvlen_bh, slopes_bh, seed, qf, kf, vf, dof, lse_f, delta)

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, n_q_blocks, n_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *r: (bh, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bh, iq, ik, *r: (bh, ik, 0)),
            pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *r: (bh, iq, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bh, iq, ik, *r: (bh, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bh, iq, ik, *r: (bh, iq, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, n_k_blocks=n_k_blocks, **common),
        grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t_q_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=min(
                max(64 * 1024 * 1024, 12 * block_q * block_k), 110 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(kvlen_bh, slopes_bh, seed, qf, kf, vf, dof, lse_f, delta)

    def unpad_q(x):
        return x.reshape(b, h, t_q_pad, d_pad)[:, :, :t_q, :d]

    def unpad_k(x):
        return x.reshape(b, h, t_k_pad, d_pad)[:, :, :t_k, :d]

    return unpad_q(dq), unpad_k(dk), unpad_k(dv)


# ---------------------------------------------------------------------------
# Dispatcher with custom VJP (Pallas forward, XLA rematerialized backward)
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 7, 8, 9)
)
def _flash_attention_ad(
    q, k, v, dropout_seed, causal, alibi_period, kv_lengths, sm_scale,
    interpret, dropout_rate,
):
    return flash_attention_pallas(
        q,
        k,
        v,
        causal=causal,
        alibi_period=alibi_period,
        kv_lengths=kv_lengths,
        sm_scale=sm_scale,
        interpret=interpret,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
    )


def _flash_fwd(
    q, k, v, dropout_seed, causal, alibi_period, kv_lengths, sm_scale,
    interpret, dropout_rate,
):
    out, lse = flash_attention_pallas(
        q, k, v, causal=causal, alibi_period=alibi_period,
        kv_lengths=kv_lengths, sm_scale=sm_scale, interpret=interpret,
        return_lse=True, dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
    return out, (q, k, v, dropout_seed, out, lse, kv_lengths)


def _flash_bwd(causal, alibi_period, sm_scale, interpret, dropout_rate, residuals, g):
    q, k, v, dropout_seed, out, lse, kv_lengths = residuals
    t_q, t_k = q.shape[2], k.shape[2]
    # short sequences: XLA's rematerialized backward is faster (kernel-launch
    # overhead dominates) and its (Tq, Tk) buffers are small. Long sequences:
    # the Pallas kernels keep memory flat and win on time. With dropout the
    # Pallas kernels are the only path that can regenerate the forward's mask.
    if dropout_rate == 0.0 and t_q * t_k <= 1024 * 1024:

        def ref(q, k, v):
            return mha_reference(
                q, k, v, causal=causal, alibi_period=alibi_period,
                kv_lengths=kv_lengths, sm_scale=sm_scale,
            )

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None, None
    dq, dk, dv = flash_attention_bwd_pallas(
        q, k, v, out, lse, g,
        causal=causal, alibi_period=alibi_period,
        kv_lengths=kv_lengths, sm_scale=sm_scale, interpret=interpret,
        dropout_rate=dropout_rate, dropout_seed=dropout_seed,
    )
    return dq, dk, dv, None, None


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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused MHA. q,k,v: (B, H, T, D). Auto-selects the Pallas kernel on TPU
    and the XLA reference elsewhere (both are numerically equivalent).

    Attention-probability dropout (train-time regularization, torch
    semantics) runs IN-KERNEL on the Pallas path: keep bits are a
    deterministic hash of (seed, batch*head, row, col) regenerated by the
    backward kernels, so training never materializes a (T, T) probability
    or mask tensor (the XLA dropout path costs both the memory and ~40%
    of the encoder's train step at T=600). Off-TPU, dropout uses the XLA
    reference with jax.random (a different — equally valid — mask stream)."""
    dropout_on = dropout_rate > 0.0 and dropout_rng is not None
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        if dropout_on:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
        else:
            seed = jnp.zeros((1,), jnp.int32)
            dropout_rate = 0.0
        return _flash_attention_ad(
            q, k, v, seed, causal, alibi_period, kv_lengths,
            sm_scale if sm_scale is not None else 1.0 / math.sqrt(q.shape[-1]),
            interpret, float(dropout_rate),
        )
    return mha_reference(
        q, k, v, causal=causal, alibi_period=alibi_period,
        kv_lengths=kv_lengths, sm_scale=sm_scale,
        dropout_rate=dropout_rate if dropout_on else 0.0,
        dropout_rng=dropout_rng,
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
    step: scalar int32 (same position for the whole batch), or a (B,)
        vector of PER-ITEM positions (multi-stream serving: concurrent
        streams sit at different absolute frames in their own caches).

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
    precision = _dot_precision(q.dtype)
    s = jnp.einsum(
        "bhd,bhkd->bhk", q, k_cache,
        preferred_element_type=jnp.float32, precision=precision,
    )
    s = s * sm_scale
    j = jnp.arange(t_max)[None, None, :]
    step = jnp.asarray(step)
    if step.ndim == 1:  # per-item positions -> broadcast over (B, H, Tmax)
        step = step[:, None, None]
    if alibi_period is not None:
        slopes = jnp.asarray(alibi_slopes(hh))
        dist = jnp.floor_divide(step - j, alibi_period).astype(jnp.float32)
        s = s - slopes[None, :, None] * dist
    s = jnp.where(j <= step, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhk,bhkd->bhd", p.astype(v_cache.dtype), v_cache, precision=precision
    )
