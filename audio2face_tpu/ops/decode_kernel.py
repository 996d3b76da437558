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
  (kron(I_B, W)) weights; q/k/v are a single merged (BD, 3*BD) matmul;
- per-(item, head) attention scores come from an elementwise q*K broadcast
  followed by a (T, BD) @ (BD, n_heads_tot) head-mask contraction, and the
  PV contraction is the mask-transpose expansion + masked reduce;
- layer norm over each item's 64 lanes is a grouped mean/var computed with a
  (BD, B_BLOCK) group-mask matmul.

Performance notes (round 2):
- grid programs execute SEQUENTIALLY on a TensorCore, so the whole batch is
  packed into ONE program (B_BLOCK=8 by default => one 3600-step loop instead
  of four). The f32 KV/cross/out buffers for 8 items at T=3600 take ~32 MB —
  beyond the default ~16 MB Mosaic window but comfortably inside v5e VMEM
  (128 MB); vmem_limit_bytes is raised accordingly.
- the causal prefix is processed in CHUNKS: the T loop is split into static
  sub-ranges and attention inside chunk c only touches cache rows
  [0, (c+1)*chunk) — halving average attention work vs full-height ops.

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
from audio2face_tpu.utils.shapes import round_up as _round_up

D = 64
N_HEADS = 4
HD = D // N_HEADS
NEG = -1e30
# dynamic single-row loads/stores require f32 (Mosaic cannot prove sublane
# alignment for bf16 rows), so every T-height buffer is f32
DEFAULT_B_BLOCK = 8
# prefix-chunking sweep at T=3600: 64->22.4ms, 256->22.7, 512->24.1,
# 1024->25.2; 256 balances step cost against per-chunk code duplication
# (each chunk instantiates its own loop body -> compile time)
CHUNK = 256


def _head_mask(b_block: int) -> np.ndarray:
    """(BD, NH_TOT) selector: mask[b*D + h*HD + i, b*N_HEADS + h] = 1."""
    m = np.zeros((b_block * D, b_block * N_HEADS), np.float32)
    for b in range(b_block):
        for h in range(N_HEADS):
            for i in range(HD):
                m[b * D + h * HD + i, b * N_HEADS + h] = 1.0
    return m


def _group_mask(b_block: int) -> np.ndarray:
    """(BD, B_BLOCK) selector of each item's 64-lane group (grouped LN)."""
    m = np.zeros((b_block * D, b_block), np.float32)
    for b in range(b_block):
        m[b * D : (b + 1) * D, b] = 1.0
    return m


def _decode_kernel(
    *refs,
    n_steps: int,
    t_pad: int,
    period: int,
    b_block: int,
    chunk: int,
    precision,
    biwi: bool = False,
):
    """Positional refs, in order:

    vocaset: cross (1, T_pad, BD) | biwi: mem_k, mem_v (1, 2*T_pad2, BD)
    then: style (1, 1, BD), pe (period, BD) tiled, hmask (BD, NH_TOT),
    hmask_t, gproj (BD, BD), slopes (1, NH_TOT), wqkv, bqkv, wo, bo,
    [biwi: wcq, bcq, wco, bco], wf1, bf1, wf2, bf2, wfb, bfb,
    ln{1,2,3} scale/bias; outputs: o (1, T_pad, BD); scratch: k, v
    (T_pad, BD) f32.

    BIWI cross attention (the reference's dead enc_dec_mask BIWI arm,
    faceformer.py:60-62): mesh frame t attends audio latents {2t, 2t+1}
    with a TRUE 2-way softmax — mem_k/mem_v are the cross k/v projections
    of the 50 fps latents, precomputed outside and lane-packed like cross.
    """
    if biwi:
        (memk_ref, memv_ref, style_ref, pe_ref, hmask_ref, hmask_t_ref,
         gproj_ref, slopes_ref,
         wqkv_ref, bqkv_ref, wo_ref, bo_ref,
         wcq_ref, bcq_ref, wco_ref, bco_ref,
         wf1_ref, bf1_ref, wf2_ref, bf2_ref, wfb_ref, bfb_ref,
         ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
         o_ref, k_scr, v_scr) = refs
    else:
        (cross_ref, style_ref, pe_ref, hmask_ref, hmask_t_ref,
         gproj_ref, slopes_ref,
         wqkv_ref, bqkv_ref, wo_ref, bo_ref,
         wf1_ref, bf1_ref, wf2_ref, bf2_ref, wfb_ref, bfb_ref,
         ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref, ln3s_ref, ln3b_ref,
         o_ref, k_scr, v_scr) = refs
    bd = b_block * D
    nh_tot = b_block * N_HEADS
    sm_scale = 1.0 / (HD**0.5)
    slopes = slopes_ref[:]  # (1, NH_TOT)

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
        # grouped layer norm: stats over each item's 64-lane block. The
        # (BD, B_BLOCK) reduce + (B_BLOCK, BD) broadcast pair is folded into
        # one precomputed (BD, BD) projection — the step loop is matmul-
        # LATENCY bound, so one matvec instead of two is a direct win.
        mu_full = mm(x, gproj_ref[:])  # (1, BD) per-group mean, broadcast
        xc = x - mu_full
        var_full = mm(xc * xc, gproj_ref[:])
        return xc * jax.lax.rsqrt(var_full + 1e-5) * s_ref[:] + b_ref[:]

    def make_step(rows_c: int):
        """Step fn whose attention touches only cache rows [0, rows_c)."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_c, nh_tot), 0)

        def step(t, emb):
            # emb: (1, BD) f32
            x = emb + pe_ref[pl.ds(t % period, 1), :]
            qkv = mm(x, wqkv_ref[:]) + bqkv_ref[:]  # (1, 3*BD) one MXU pass
            q = qkv[:, :bd]
            k_scr[pl.ds(t, 1), :] = qkv[:, bd : 2 * bd]
            v_scr[pl.ds(t, 1), :] = qkv[:, 2 * bd :]

            # per-(item, head) scores on the live prefix chunk only. q is
            # folded into the head mask first (BD x NH_TOT elementwise), so
            # the prefix-height work is ONE matmul — no (rows_c, BD)
            # elementwise pass over the cache.
            qmask = hmask_ref[:] * jnp.transpose(q * sm_scale)  # (BD, NH_TOT)
            s = mm(k_scr[:rows_c, :], qmask)  # (rows_c, NH_TOT)
            dist = jax.lax.div(t - rows, period)
            s = s - slopes * dist.astype(jnp.float32)
            s = jnp.where(rows <= t, s, NEG)

            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s - m)
            z = jnp.sum(p, axis=0, keepdims=True)
            # normalization deferred past the PV reduce: scale the (1, BD)
            # result instead of the (rows_c, NH_TOT) probabilities
            p_exp = mm(p, hmask_t_ref[:])  # (rows_c, BD)
            attn = jnp.sum(p_exp * v_scr[:rows_c, :], axis=0, keepdims=True)
            attn = attn * mm(1.0 / z, hmask_t_ref[:])

            sa = mm(attn, wo_ref[:]) + bo_ref[:]
            h = ln(x + sa, ln1s_ref, ln1b_ref)
            if biwi:
                # true 2-way cross softmax over latents {2t, 2t+1}: the
                # same folded-q trick as self-attention, on a 2-row prefix
                qc = mm(h, wcq_ref[:]) + bcq_ref[:]
                qcm = hmask_ref[:] * jnp.transpose(qc * sm_scale)
                k2 = memk_ref[0, pl.ds(2 * t, 2), :]  # (2, BD)
                v2 = memv_ref[0, pl.ds(2 * t, 2), :]
                s2 = mm(k2, qcm)  # (2, NH_TOT)
                m2 = jnp.max(s2, axis=0, keepdims=True)
                p2 = jnp.exp(s2 - m2)
                z2 = jnp.sum(p2, axis=0, keepdims=True)
                p2e = mm(p2, hmask_t_ref[:])  # (2, BD)
                ca = jnp.sum(p2e * v2, axis=0, keepdims=True)
                ca = ca * mm(1.0 / z2, hmask_t_ref[:])
                ca = mm(ca, wco_ref[:]) + bco_ref[:]
            else:
                ca = cross_ref[0, pl.ds(t, 1), :].astype(jnp.float32)
            h = ln(h + ca, ln2s_ref, ln2b_ref)
            ff = mm(jnp.maximum(mm(h, wf1_ref[:]) + bf1_ref[:], 0.0), wf2_ref[:]) + bf2_ref[:]
            h = ln(h + ff, ln3s_ref, ln3b_ref)

            o_ref[0, pl.ds(t, 1), :] = h.astype(o_ref.dtype)
            return mm(h, wfb_ref[:]) + bfb_ref[:] + style_ref[0]

        return step

    emb = style_ref[0].astype(jnp.float32)
    # static chunking of the T loop: chunk c sees a prefix of (c+1)*chunk rows
    for lo in range(0, n_steps, chunk):
        hi = min(lo + chunk, n_steps)
        rows_c = min(lo + chunk, t_pad)
        emb = jax.lax.fori_loop(lo, hi, make_step(rows_c), emb)


# Mosaic VMEM window ceiling requested by faceformer_decode_loop (v5e VMEM
# is 128 MB; leave headroom for Mosaic's own buffers)
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _block_shape(b: int, b_block: int | None) -> tuple[int, int]:
    """(b_block, bd) exactly as faceformer_decode_loop would choose them."""
    if b_block is None:
        b_block = min(_round_up(b, 2), DEFAULT_B_BLOCK)
    return b_block, b_block * D


def vmem_bytes_needed(
    b: int, t: int, b_block: int | None = None, *, biwi: bool = False
) -> int:
    """Trace-time VMEM budget of the fused kernel for (batch, frames).

    Mirrors the allocation in faceformer_decode_loop: the T-height f32
    buffers (cross + out + k/v scratch + per-step attention temporaries —
    BIWI swaps the cross buffer for the two 2T-height mem_k/mem_v
    projections), the blocked f32 weight set, and fixed headroom."""
    _, bd = _block_shape(b, b_block)
    t_pad = _round_up(t, 8)
    t_units = 9 if biwi else 6
    return t_units * t_pad * bd * 4 + 16 * bd * bd * 4 + 8 * 1024 * 1024


def fits_vmem(
    b: int, t: int, b_block: int | None = None, *, biwi: bool = False
) -> bool:
    """True iff the fused mega-kernel's buffers fit the VMEM window for a
    (batch, frames) decode. Callers (FaceFormer.__call__ auto-selection,
    serving) MUST fall back to the lax.scan path when this is False: the
    scan is correct at any T, just slower per step. Without this check a
    long clip (batch-8 past ~2.3 min, single-stream past ~9 min) dies in
    a Mosaic OOM instead of decoding."""
    return vmem_bytes_needed(b, t, b_block, biwi=biwi) <= VMEM_LIMIT_BYTES


def faceformer_decode_loop(
    cross: jnp.ndarray | None,  # (B, T, D) precomputed cross term (vocaset)
    style: jnp.ndarray,  # (B, D)
    pe: jnp.ndarray,  # (period, D)
    weights: dict,  # q/k/v/o/f1/f2/fb kernels+biases, ln{1,2,3} scale/bias
    *,
    period: int = 60,
    interpret: bool = False,
    fast_math: bool = True,
    b_block: int | None = None,
    chunk: int = CHUNK,
    mem_k: jnp.ndarray | None = None,  # (B, H, 2T, hd) BIWI cross keys
    mem_v: jnp.ndarray | None = None,  # (B, H, 2T, hd) BIWI cross values
) -> jnp.ndarray:
    """Run the fused decode loop; returns hidden states (B, T, D).

    vocaset mode passes ``cross`` (the hoisted diagonal cross term); BIWI
    mode passes ``mem_k``/``mem_v`` (cross k/v projections of the 50 fps
    latents) plus ``cq``/``co`` entries in ``weights`` — each step runs a
    true 2-way softmax over latents {2t, 2t+1} in-kernel."""
    biwi = mem_k is not None
    if biwi:
        assert mem_v is not None and cross is None
        b, _, s, hd = mem_k.shape
        t = s // 2
    else:
        b, t, d = cross.shape
        assert d == D
    b_block, bd = _block_shape(b, b_block)
    need = vmem_bytes_needed(b, t, b_block, biwi=biwi)
    if need > VMEM_LIMIT_BYTES:
        raise ValueError(
            f"fused decode kernel needs ~{need / 2**20:.0f} MB of VMEM for "
            f"batch={b} (block {b_block}), T={t} — over the "
            f"{VMEM_LIMIT_BYTES / 2**20:.0f} MB window. Use the lax.scan "
            "decode path (decode_impl='scan') for clips this long; "
            "FaceFormer's auto-selection (decode_impl=None) does so."
        )
    b_pad = _round_up(b, b_block)
    t_pad = _round_up(t, 8)
    n_blocks = b_pad // b_block

    def pack(x, rows):  # (B, rows, D) -> (n_blocks, rows_pad, BD)
        rows_pad = _round_up(rows, 8)
        x = jnp.pad(
            x.astype(jnp.float32),
            ((0, b_pad - b), (0, rows_pad - rows), (0, 0)),
        )
        x = x.reshape(n_blocks, b_block, rows_pad, D).transpose(0, 2, 1, 3)
        return x.reshape(n_blocks, rows_pad, bd)

    if biwi:
        # (B, H, 2T, hd) -> (B, 2T, D) with the kernel's h*HD+i lane layout
        def flat_heads(m):
            return m.transpose(0, 2, 1, 3).reshape(b, s, D)

        memk_p = pack(flat_heads(mem_k), s)
        memv_p = pack(flat_heads(mem_v), s)
        data_inputs = [memk_p, memv_p]
    else:
        data_inputs = [pack(cross, t)]
    style_p = jnp.pad(style.astype(jnp.float32), ((0, b_pad - b), (0, 0))).reshape(n_blocks, 1, bd)

    eye = jnp.eye(b_block, dtype=jnp.float32)

    def blocked(wname):
        return jnp.kron(eye, weights[wname].astype(jnp.float32))

    def tiled(vname):
        return jnp.tile(weights[vname].astype(jnp.float32), b_block)[None]

    # merged q/k/v: one (BD, 3*BD) matmul per step instead of three
    wqkv = jnp.concatenate(
        [blocked("q_kernel"), blocked("k_kernel"), blocked("v_kernel")], axis=1
    )
    bqkv = jnp.concatenate(
        [tiled("q_bias"), tiled("k_bias"), tiled("v_bias")], axis=1
    )
    weight_arrays = [wqkv, bqkv, blocked("o_kernel"), tiled("o_bias")]
    if biwi:
        for name in ("cq", "co"):
            weight_arrays.append(blocked(f"{name}_kernel"))
            weight_arrays.append(tiled(f"{name}_bias"))
    for name in ("f1", "f2", "fb"):
        weight_arrays.append(blocked(f"{name}_kernel"))
        weight_arrays.append(tiled(f"{name}_bias"))
    for i in (1, 2, 3):
        weight_arrays.append(tiled(f"ln{i}_scale"))
        weight_arrays.append(tiled(f"ln{i}_bias"))

    hmask = jnp.asarray(_head_mask(b_block))
    gmask = np.asarray(_group_mask(b_block))
    gproj = jnp.asarray((gmask @ gmask.T) / D)  # (BD, BD) grouped-mean proj
    slopes = jnp.tile(jnp.asarray(alibi_slopes(N_HEADS)), b_block)[None]
    pe_packed = jnp.tile(pe.astype(jnp.float32), (1, b_block))

    precision = (
        jax.lax.Precision.DEFAULT if fast_math else jax.lax.Precision.HIGHEST
    )
    kernel = functools.partial(
        _decode_kernel, n_steps=t, t_pad=t_pad, period=period,
        b_block=b_block, chunk=chunk, precision=precision, biwi=biwi,
    )

    data_specs = [
        pl.BlockSpec(
            (1, x.shape[1], bd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        for x in data_inputs
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=data_specs
        + [
            pl.BlockSpec((1, 1, bd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 + len(weight_arrays)),
        out_specs=pl.BlockSpec((1, t_pad, bd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, t_pad, bd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_pad, bd), jnp.float32),
            pltpu.VMEM((t_pad, bd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(int(need), VMEM_LIMIT_BYTES),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * t_pad * bd * 2 + t * (bd * bd * 10),
            bytes_accessed=sum(x.size for x in data_inputs) * 4 * 2,
            transcendentals=t * t_pad * b_block * N_HEADS,
        ),
        interpret=interpret,
    )(
        *data_inputs, style_p, pe_packed, hmask, jnp.transpose(hmask),
        gproj, slopes, *weight_arrays,
    )

    # unpack (n_blocks, T_pad, BD) -> (B, T, D)
    out_dtype = (mem_k if biwi else cross).dtype
    out = out.reshape(n_blocks, t_pad, b_block, D).transpose(0, 2, 1, 3)
    return out.reshape(b_pad, t_pad, D)[:b, :t].astype(out_dtype)
