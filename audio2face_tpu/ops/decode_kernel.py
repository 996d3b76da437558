"""Fused FaceFormer decode loop as a single Pallas mega-kernel.

The XLA `lax.scan` decode (models/faceformer.py) pays per-step overhead and
round-trips the KV cache through HBM every frame: ~120 us/step, ~440 ms for a
60 s clip. This kernel runs the *whole* autoregressive loop on-chip: KV
caches live in VMEM scratch across all T steps, every step is a handful of
small MXU matmuls and (T, lanes) VPU ops, and the only HBM traffic is the
input memory projection and the output hidden states.

Semantics are exactly the scan step (which itself equals the reference's
O(T^2)-recompute loop, src/model/faceformer.py:154-185):

  x_t   = emb_t + PPE[t mod 60]
  attn  = softmax_{j<=t}(q_t . k_j / sqrt(hd) - slope_h * ((t-j) // 60)) v_j
  h     = LN1(x_t + W_o attn)
  h     = LN2(h + cross_t)            # diagonal cross-attention, precomputed
  h     = LN3(h + W_2 relu(W_1 h))
  emb_{t+1} = h @ (W_r W_m) + b + style

Layout: a block of B_BLOCK batch items is packed on the *lane* axis as
(1, B_BLOCK*64) — Mosaic-friendly, no cross-lane reshapes anywhere:

- per-item dense layers become one matmul against block-diagonal
  (kron(I_B, W)) weights;
- per-(item, head) attention scores come from an elementwise q*K broadcast
  followed by a (T, 256) @ (256, 16) head-mask contraction, and the PV
  contraction is the mask-transpose expansion + masked reduce;
- layer norm over each item's 64 lanes is a grouped mean/var computed with a
  (256, 4) group-mask matmul.

Inference-only (training differentiates through the lax.scan path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio2face_tpu.ops.attention import alibi_slopes

D = 64
N_HEADS = 4
HD = D // N_HEADS
# 2 items per grid program keeps all T=3600 f32 buffers (KV caches + cross +
# out) under the ~16 MB VMEM budget; dynamic single-row loads/stores require
# f32 (Mosaic cannot prove sublane alignment for bf16 rows)
B_BLOCK = 2
BD = B_BLOCK * D
NH_TOT = B_BLOCK * N_HEADS
NEG = -1e30


def _head_mask() -> np.ndarray:
    """(BD, NH_TOT) selector: mask[b*D + h*HD + i, b*N_HEADS + h] = 1."""
    m = np.zeros((BD, NH_TOT), np.float32)
    for b in range(B_BLOCK):
        for h in range(N_HEADS):
            for i in range(HD):
                m[b * D + h * HD + i, b * N_HEADS + h] = 1.0
    return m


def _group_mask() -> np.ndarray:
    """(BD, B_BLOCK) selector of each item's 64-lane group (for grouped LN)."""
    m = np.zeros((BD, B_BLOCK), np.float32)
    for b in range(B_BLOCK):
        m[b * D : (b + 1) * D, b] = 1.0
    return m


def _decode_kernel(
    # inputs
    cross_ref,  # (1, T_pad, BD)
    style_ref,  # (1, 1, BD)
    pe_ref,  # (period, BD) tiled
    hmask_ref,  # (BD, NH_TOT)
    hmask_t_ref,  # (NH_TOT, BD)
    gmask_ref,  # (BD, B_BLOCK)
    gmask_t_ref,  # (B_BLOCK, BD)
    slopes_ref,  # (1, NH_TOT)
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref, wfb_ref, bfb_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
    # outputs
    o_ref,  # (1, T_pad, BD)
    # scratch
    k_scr,  # (T_pad, BD) f32
    v_scr,  # (T_pad, BD) f32
    *,
    n_steps: int,
    t_pad: int,
    period: int,
    precision,
):
    sm_scale = 1.0 / (HD**0.5)
    slopes = slopes_ref[:]  # (1, NH_TOT)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_pad, NH_TOT), 0)

    # zero the caches: rows beyond the current step have ~0 softmax weight,
    # but garbage (or NaN) values would still poison the PV reduce via 0*NaN
    k_scr[:] = jnp.zeros_like(k_scr)
    v_scr[:] = jnp.zeros_like(v_scr)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    def ln(x, s_ref, b_ref):
        # grouped layer norm: stats over each item's 64-lane block
        mu = mm(x, gmask_ref[:]) * (1.0 / D)  # (1, B_BLOCK)
        mu_full = mm(mu, gmask_t_ref[:])  # (1, BD)
        xc = x - mu_full
        var = mm(xc * xc, gmask_ref[:]) * (1.0 / D)
        var_full = mm(var, gmask_t_ref[:])
        return xc * jax.lax.rsqrt(var_full + 1e-5) * s_ref[:] + b_ref[:]

    def step(t, emb):
        # emb: (1, BD) f32
        x = emb + pe_ref[pl.ds(t % period, 1), :]
        q = mm(x, wq_ref[:]) + bq_ref[:]
        k = mm(x, wk_ref[:]) + bk_ref[:]
        v = mm(x, wv_ref[:]) + bv_ref[:]
        k_scr[pl.ds(t, 1), :] = k
        v_scr[pl.ds(t, 1), :] = v

        # per-(item, head) scores: broadcast q over the cache, contract lanes
        s = mm(k_scr[:] * q, hmask_ref[:]) * sm_scale  # (T_pad, NH_TOT)
        dist = jax.lax.div(t - rows, period)
        s = s - slopes * dist.astype(jnp.float32)
        s = jnp.where(rows <= t, s, NEG)

        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp(s - m)
        z = jnp.sum(p, axis=0, keepdims=True)
        p = p / z
        # expand per-(item, head) probs back onto lanes, contract with V
        p_exp = mm(p, hmask_t_ref[:])  # (T_pad, BD)
        attn = jnp.sum(p_exp * v_scr[:], axis=0, keepdims=True)  # (1, BD)

        sa = mm(attn, wo_ref[:]) + bo_ref[:]
        h = ln(x + sa, ln1s_ref, ln1b_ref)
        h = ln(h + cross_ref[0, pl.ds(t, 1), :].astype(jnp.float32), ln2s_ref, ln2b_ref)
        ff = mm(jnp.maximum(mm(h, wf1_ref[:]) + bf1_ref[:], 0.0), wf2_ref[:]) + bf2_ref[:]
        h = ln(h + ff, ln3s_ref, ln3b_ref)

        o_ref[0, pl.ds(t, 1), :] = h.astype(o_ref.dtype)
        return mm(h, wfb_ref[:]) + bfb_ref[:] + style_ref[0]

    jax.lax.fori_loop(0, n_steps, step, style_ref[0].astype(jnp.float32))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def faceformer_decode_loop(
    cross: jnp.ndarray,  # (B, T, D) precomputed cross-attention term
    style: jnp.ndarray,  # (B, D)
    pe: jnp.ndarray,  # (period, D)
    weights: dict,  # q/k/v/o/f1/f2/fb kernels+biases, ln{1,2,3} scale/bias
    *,
    period: int = 60,
    interpret: bool = False,
    fast_math: bool = True,
) -> jnp.ndarray:
    """Run the fused decode loop; returns hidden states (B, T, D)."""
    b, t, d = cross.shape
    assert d == D
    b_pad = _round_up(b, B_BLOCK)
    t_pad = _round_up(t, 8)
    n_blocks = b_pad // B_BLOCK

    # pack (B, T, D) -> (n_blocks, T_pad, B_BLOCK*D): items on the lane axis
    cross_p = jnp.pad(cross.astype(jnp.float32), ((0, b_pad - b), (0, t_pad - t), (0, 0)))
    cross_p = cross_p.reshape(n_blocks, B_BLOCK, t_pad, D).transpose(0, 2, 1, 3)
    cross_p = cross_p.reshape(n_blocks, t_pad, BD)
    style_p = jnp.pad(style.astype(jnp.float32), ((0, b_pad - b), (0, 0))).reshape(n_blocks, 1, BD)

    eye = jnp.eye(B_BLOCK, dtype=jnp.float32)

    def blocked(wname):
        return jnp.kron(eye, weights[wname].astype(jnp.float32))

    def tiled(vname):
        return jnp.tile(weights[vname].astype(jnp.float32), B_BLOCK)[None]

    weight_arrays = []
    for name in ("q", "k", "v", "o", "f1", "f2", "fb"):
        weight_arrays.append(blocked(f"{name}_kernel"))
        weight_arrays.append(tiled(f"{name}_bias"))
    for i in (1, 2, 3):
        weight_arrays.append(tiled(f"ln{i}_scale"))
        weight_arrays.append(tiled(f"ln{i}_bias"))

    hmask = jnp.asarray(_head_mask())
    gmask = jnp.asarray(_group_mask())
    slopes = jnp.tile(jnp.asarray(alibi_slopes(N_HEADS)), B_BLOCK)[None]
    pe_packed = jnp.tile(pe.astype(jnp.float32), (1, B_BLOCK))

    precision = (
        jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST
    )
    kernel = functools.partial(
        _decode_kernel, n_steps=t, t_pad=t_pad, period=period, precision=precision
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, t_pad, BD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + len(weight_arrays)),
        out_specs=pl.BlockSpec((1, t_pad, BD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, t_pad, BD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_pad, BD), jnp.float32),
            pltpu.VMEM((t_pad, BD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * t_pad * BD * 2 + t * (BD * BD * 10),
            bytes_accessed=cross_p.size * 4 * 2,
            transcendentals=t * t_pad * NH_TOT,
        ),
        interpret=interpret,
    )(
        cross_p, style_p, pe_packed, hmask, jnp.transpose(hmask),
        gmask, jnp.transpose(gmask), slopes, *weight_arrays,
    )

    # unpack (n_blocks, T_pad, BD) -> (B, T, D)
    out = out.reshape(n_blocks, t_pad, B_BLOCK, D).transpose(0, 2, 1, 3)
    return out.reshape(b_pad, t_pad, D)[:b, :t].astype(cross.dtype)
