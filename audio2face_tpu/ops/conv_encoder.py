"""Fused wav2vec2 conv feature encoder: XLA layer 0 + one Pallas kernel for
layers 1-6.

The 7-layer conv stack (HF wav2vec2-base architecture; reference
src/model/wav2vec.py:116 via feature_extractor) is HBM-bound under XLA: the
layer-0 output is (B, L/5, 512) — 1.6 GB bf16 for batch-8 x 60 s — and every
subsequent layer round-trips its activations through HBM. Here:

- the ONLY array that goes to HBM is the layer-0 im2col (B, T0, 16) bf16 —
  50 MB at 60 s x batch-8. Everything else (all 7 conv layers, the group-norm
  affine, every GELU) happens inside one Pallas kernel. An XLA layer-0
  pre-pass was measured at ~17 ms alone: its (B, T0, 512) output is 1.6 GB
  and must round-trip HBM;
- group norm needs GLOBAL time statistics, which would break time-tiling —
  but conv0 is linear, so the exact per-(item, channel) stats come
  analytically from the im2col second moments:

    mean_c   = sum_j W0[j,c] mu_j,          mu_j = E_t[x_{5t+j}]
    E[y^2]_c = sum_jk W0[j,c] W0[k,c] C_jk, C_jk = E_t[x_{5t+j} x_{5t+k}]

  a (10, 10) correlation per item — essentially free, and identical to the
  masked (length-aware) statistics when a mask is supplied;
- layers 1-6 run in ONE Pallas kernel: the grid tiles the output time axis,
  each program DMAs its (overlapping, receptive-field-wide) slice of the
  layer-0 output from HBM and keeps all intermediates in VMEM. Total HBM
  traffic for 6 layers: one read of the l0 output + one write of the
  (B, T/64, 512) result.

Stride-2 convs inside the kernel avoid strided sublane loads via the pairing
trick: reshape (2T, 512) -> (T, 1024) puts frames (2t, 2t+1) on one row, so
k=3/s=2 is `z1 @ [W0;W1] + z2[:, :512] @ W2` (z2 = the reshape shifted by one
frame) and k=2/s=2 is a single `z1 @ [W0;W1]` — exact FLOPs, all MXU.

Matmuls run with bf16 inputs and f32 accumulation (DEFAULT precision), the
same numerics as the XLA bf16 path this replaces; use the XLA path
(use_pallas False / non-TPU) for f32 parity work. GELU inside the kernel uses
the Abramowitz-Stegun erf (Mosaic lowers neither erf nor erfc); its 1.5e-7
error is two orders below bf16 resolution.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from audio2face_tpu.utils.shapes import round_up as _round_up

# wav2vec2-base conv stack: (kernel, stride) per layer; 512 channels after l0
CONV_KERNEL = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDE = (5, 2, 2, 2, 2, 2, 2)
C = 512
K0, S0 = CONV_KERNEL[0], CONV_STRIDE[0]
EPS = 1e-5


def stack_output_length(input_length: int) -> int:
    length = input_length
    for k, s in zip(CONV_KERNEL, CONV_STRIDE):
        length = (length - k) // s + 1
    return length


def _tile_chain(f: int) -> list[int]:
    """Rows each of l0..l6 must provide for one tile of ``f`` final frames
    (bottom-up); +1 margin on k=3 layers for the pairing reshape."""
    counts = [f]
    for k, s in zip(CONV_KERNEL[:0:-1], CONV_STRIDE[:0:-1]):
        need = s * counts[0] + (k - s)
        counts.insert(0, need + (1 if k == 3 else 0))
    return counts  # len 7: rows of l0..l6 outputs (counts[6] == f)


def _im2col10(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L) waveform -> (B, T0, 10) windows at stride 5 (layer-0 im2col)."""
    b, n = x.shape
    t0 = (n - K0) // S0 + 1
    lo = x[:, : S0 * t0 + S0]
    lo = jnp.pad(lo, ((0, 0), (0, S0 * (t0 + 1) - lo.shape[1])))
    rows = lo.reshape(b, t0 + 1, S0)
    return jnp.concatenate([rows[:, :t0], rows[:, 1 : t0 + 1]], axis=-1)


def conv0_groupnorm_stats(
    xi: jnp.ndarray,  # (B, T0, 10) f32 im2col
    w0: jnp.ndarray,  # (10, C) f32 layer-0 kernel
    feat_lengths: Optional[jnp.ndarray] = None,  # (B,) valid T0 rows
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-(item, channel) mean and rstd of the conv0 output —
    MaskedGroupNorm's statistics — via the linear/quadratic identities."""
    b, t0, _ = xi.shape
    xi32 = xi.astype(jnp.float32)
    if feat_lengths is None:
        n = jnp.full((b, 1), float(t0), jnp.float32)
        xm = xi32
    else:
        valid = (
            jnp.arange(t0)[None, :] < feat_lengths[:, None]
        ).astype(jnp.float32)[..., None]
        n = jnp.maximum(feat_lengths.astype(jnp.float32), 1.0)[:, None]
        xm = xi32 * valid
    mu = jnp.sum(xm, axis=1) / n  # (B, 10)
    corr = jnp.einsum(
        "btj,btk->bjk", xm, xm, precision=jax.lax.Precision.HIGHEST
    ) / n[..., None]
    w0 = w0.astype(jnp.float32)
    mean = mu @ w0  # (B, C)
    ey2 = jnp.einsum(
        "bjk,jc,kc->bc", corr, w0, w0, precision=jax.lax.Precision.HIGHEST
    )
    var = jnp.maximum(ey2 - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + EPS)


def _packed_im2col_and_stats(
    x: jnp.ndarray,  # (B, L) f32 waveform
    w0: jnp.ndarray,  # (10, C) f32
    t0: int,
    t0_pad: int,
    feat_lengths: Optional[jnp.ndarray] = None,  # (B,) valid windows
):
    """Build the 8-frame-packed bf16 im2col and the exact group-norm stats
    WITHOUT any narrow-lane intermediate.

    XLA tiles every HBM array to 128 lanes, so a (B, T0, 10) f32 im2col is
    physically 12.8x its logical size — the naive build + stats einsum cost
    ~6 ms at 60 s x batch-8 (and ~4 GB of HBM at 3 minutes, enough to OOM
    the chip next to the encoder's own buffers). Here the only intermediate
    is (B, G, 48) f32 (G = T0/8): row g holds samples [40g, 40g+48), i.e.
    the union of the 8 overlapping windows of frame group g.

    - packing: window j' of group g occupies lanes [5j', 5j'+10) of the row,
      so the (48 -> 128) 0/1 selection matrix M with
      M[5j'+l, 16j'+l] = 1 produces the packed layout in ONE matmul;
    - statistics: mu_j = sum_{j'} rowmean[5j'+j], and the (10, 10) window
      correlation C_jk = sum_{j'} R[5j'+j, 5j'+k] where R is the (48, 48)
      row self-correlation — one MXU contraction over G instead of a
      128-lane-padded einsum over T0. Boundary windows are handled exactly:
      without ``feat_lengths``, the at-most-two fractional windows past t0
      are subtracted; with ``feat_lengths`` (per-item masked statistics,
      MaskedGroupNorm semantics), whole groups are masked with a (B, G)
      0/1 matrix and each item's partial group adds its < 8 valid windows
      via seven (B, 10) dynamic-slice gathers.
    """
    b, n = x.shape
    g_rows = t0_pad // 8
    xpad = jnp.pad(x, ((0, 0), (0, max(40 * g_rows + 48 - n, 0))))
    a = xpad[:, : 40 * g_rows].reshape(b, g_rows, 40)
    a2 = xpad[:, 40 : 40 * (g_rows + 1)].reshape(b, g_rows, 40)[:, :, :8]
    rows48 = jnp.concatenate([a, a2], axis=-1)  # (B, G, 48) f32

    # selection matrix: lane 5j'+l of a row -> packed lane 16j'+l
    sel = np.zeros((48, 128), np.float32)
    for jp in range(8):
        for l in range(K0):
            sel[5 * jp + l, 16 * jp + l] = 1.0
    xi16 = jnp.einsum(
        "bgs,sm->bgm", rows48.astype(jnp.bfloat16),
        jnp.asarray(sel, jnp.bfloat16),
    ).astype(jnp.bfloat16)  # (B, G, 128)

    # ---- statistics (f32, exact) ------------------------------------
    if feat_lengths is None:
        rows_m = rows48
        rowsum = jnp.sum(rows48, axis=1)  # (B, 48)
    else:
        gp = feat_lengths // 8  # (B,) full groups
        rem = feat_lengths % 8  # (B,) windows in the partial group
        gmask = (
            jnp.arange(g_rows)[None, :] < gp[:, None]
        ).astype(jnp.float32)  # (B, G)
        rows_m = rows48 * gmask[..., None]
        rowsum = jnp.sum(rows_m, axis=1)
    corr48 = jnp.einsum(
        "bga,bgh->bah", rows_m, rows48,  # 0/1 mask: applying it once is exact
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 48, 48)
    musum = sum(rowsum[:, 5 * d : 5 * d + K0] for d in range(8))  # (B, 10)
    csum = sum(
        corr48[:, 5 * d : 5 * d + K0, 5 * d : 5 * d + K0] for d in range(8)
    )  # (B, 10, 10)
    if feat_lengths is None:
        # subtract fractional windows: invalid window w >= t0 contributes
        # iff it still overlaps real samples (5w < n). Since 5*t0 >= n - 9,
        # at most the two windows t0 and t0+1 qualify (for n % 5 != 0 BOTH
        # can hold real samples); anything later starts at >= n and is
        # all-zero.
        for w in (t0, t0 + 1):
            if w < t0_pad and 5 * w < n:
                frac = xpad[:, 5 * w : 5 * w + K0]  # (B, 10)
                musum = musum - frac
                csum = csum - jnp.einsum("bj,bk->bjk", frac, frac)
        denom = jnp.full((b, 1), float(t0), jnp.float32)
    else:
        # add the partial group's valid windows (window 8*gp + j', j' < rem)
        base = 40 * gp  # (B,) sample offset of each item's partial group
        take = jax.vmap(
            lambda xb, i: jax.lax.dynamic_slice(xb, (i,), (K0,))
        )
        for jp in range(7):
            frac = take(xpad, base + 5 * jp)  # (B, 10)
            frac = frac * (jp < rem).astype(jnp.float32)[:, None]
            musum = musum + frac
            csum = csum + jnp.einsum("bj,bk->bjk", frac, frac)
        denom = jnp.maximum(feat_lengths.astype(jnp.float32), 1.0)[:, None]
    mu = musum / denom
    corr = csum / denom[..., None]
    w0f = w0.astype(jnp.float32)
    mean = mu @ w0f  # (B, C)
    ey2 = jnp.einsum(
        "bjk,jc,kc->bc", corr, w0f, w0f, precision=jax.lax.Precision.HIGHEST
    )
    var = jnp.maximum(ey2 - jnp.square(mean), 0.0)
    return xi16, mean, jax.lax.rsqrt(var + EPS)


def _gelu_exact(x):
    # Abramowitz-Stegun 7.1.26 rational erf (|eps| <= 1.5e-7)
    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _stack_kernel(
    xi_hbm,  # (B, T0_pad/8, 128) bf16 in ANY (HBM) — 8-frame-packed im2col
    gs_ref,  # (1, 1, 8C) f32 VMEM — folded GN scale, lane-tiled x8, this item
    gb_ref,  # (1, 1, 8C) f32 VMEM — folded GN bias, lane-tiled x8
    w0_ref,  # (128, 8C) bf16 VMEM — block-structured layer-0 kernel
    *w_refs,  # per layer: A=(2C, C) [+ B2=(C, C) for k=3] bf16 in VMEM
    o_ref=None,  # (1, F, C) bf16 output block
    xi_scr=None,  # (c0_pad/8, 128) bf16 VMEM scratch
    sem=None,
    counts: tuple[int, ...] = (),
    f: int = 0,
    precision=None,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    c0p = xi_scr.shape[0]  # packed rows = c0_pad / 8

    # output tiles map to overlapping input windows (receptive field), which
    # BlockSpec cannot express — DMA the slice explicitly. The slice is the
    # layer-0 *input*: 8 frames of 16 im2col taps per 128-lane row, 32x
    # smaller than the layer-0 output an XLA pre-pass would round-trip.
    start = pl.multiple_of(i * 8 * f, 8)
    dma = pltpu.make_async_copy(
        xi_hbm.at[bi, pl.ds(start, c0p), :], xi_scr, sem
    )
    dma.start()

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    dma.wait()
    # layer 0 (k=10, s=5 — already unrolled into im2col rows) in the packed
    # layout: row g holds frames 8g..8g+7, the block-diagonal w0_ref maps
    # frame j's taps (lanes 16j..16j+10) to output lanes [512j, 512j+512).
    # The folded group-norm affine + GELU apply packed; the row-major unpack
    # (g, 4096) -> (8g, 512) folds into the next matmul's operand read.
    y0 = mm(xi_scr[:], w0_ref[:])
    h = (
        _gelu_exact(y0 * gs_ref[0, 0] + gb_ref[0, 0])
        .astype(jnp.bfloat16)
        .reshape(8 * c0p, C)
    )

    wi = 0
    for li, (k, s) in enumerate(zip(CONV_KERNEL[1:], CONV_STRIDE[1:]), start=1):
        t_out = counts[li]
        z = h[: 2 * t_out + (2 if k == 3 else 0), :]
        z1 = z[: 2 * t_out].reshape(t_out, 2 * C)
        y = mm(z1, w_refs[wi][:])
        wi += 1
        if k == 3:
            z2 = z[2 : 2 * t_out + 2].reshape(t_out, 2 * C)[:, :C]
            y = y + mm(z2, w_refs[wi][:])
            wi += 1
        h = _gelu_exact(y).astype(jnp.bfloat16)

    o_ref[0, :, :] = h[:f, :]


def fused_conv_encoder(
    x: jnp.ndarray,  # (B, L) f32 waveform
    kernels: list[jnp.ndarray],  # per layer (k, c_in, c_out) f32
    gn_scale: jnp.ndarray,  # (C,)
    gn_bias: jnp.ndarray,  # (C,)
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid samples
    *,
    tile_frames: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Waveform -> (B, T_out, C) bf16 latents (conv stack + GN + GELU)."""
    b, n = x.shape
    t_final = stack_output_length(n)
    t0 = (n - K0) // S0 + 1
    f = min(tile_frames, _round_up(t_final, 8))
    n_tiles = -(-t_final // f)
    counts = tuple(_tile_chain(f))
    # rows are packed 8-per-128-lane-row for the HBM array and the DMA;
    # 128-row granularity keeps the packed scratch sublane-aligned (bf16: 16)
    c0_pad = _round_up(counts[0], 128)
    t0_pad = max(64 * (n_tiles - 1) * f + c0_pad, _round_up(t0, 128))

    w0 = kernels[0].reshape(K0, C)

    # layer 0 runs INSIDE the kernel: only the packed (B, T0/8, 128) bf16
    # im2col goes to HBM — 50 MB at 60 s x batch-8, where the layer-0 output
    # an XLA pre-pass would round-trip is 1.6 GB (measured at ~17 ms, more
    # than the whole kernel). Each 128-lane row packs 8 frames of 16 taps
    # (10 valid + 6 zeros).
    # narrow-lane-free build for BOTH paths: the naive (B, T0, 10) im2col
    # is physically 12.8x its logical size in XLA's 128-lane tiling — at
    # 3-minute batch-8 clips that alone OOMs HBM (found by the round-3
    # long-clip drive). Masked statistics ride the same packed build.
    # clamp: lengths < K0 (e.g. a fully-padded zero-length row) would give a
    # NEGATIVE window count, whose `% 8` wraps positive and sums garbage
    # windows into that row's masked stats — clamped to 0 the mask is empty
    # and the stats degrade to zeros, like the unfused path
    feat_lengths = (
        None if lengths is None else jnp.maximum((lengths - K0) // S0 + 1, 0)
    )
    xi16, mean, rstd = _packed_im2col_and_stats(x, w0, t0, t0_pad, feat_lengths)

    # fold GN into one affine on the conv0 output: y * gs + gb
    gs = (rstd * gn_scale[None, :])[:, None, :]  # (B, 1, C)
    gb = (gn_bias[None, :] - mean * rstd * gn_scale[None, :])[:, None, :]
    # block-structured layer-0 kernel: w0big[16j + l, 512j + c] = w0[l, c]
    w0p16 = jnp.pad(w0.astype(jnp.bfloat16), ((0, 16 - K0), (0, 0)))  # (16, C)
    w0big = (
        jnp.eye(8, dtype=jnp.bfloat16)[:, None, :, None] * w0p16[None, :, None, :]
    ).reshape(128, 8 * C)
    # the GN affine applies in the packed layout: tile scale/bias x8 lanes
    gs8 = jnp.tile(gs, (1, 1, 8))
    gb8 = jnp.tile(gb, (1, 1, 8))

    w_arrays = []
    for k_l, w in zip(CONV_KERNEL[1:], kernels[1:]):
        w = w.astype(jnp.bfloat16)
        w_arrays.append(jnp.concatenate([w[0], w[1]], axis=0))  # (2C, C)
        if k_l == 3:
            w_arrays.append(w[2])  # (C, C)

    t_final_pad = n_tiles * f

    def kern(xi_r, gs_r, gb_r, w0_r, *rest):
        *ws, o_r, scr, sem = rest
        return _stack_kernel(
            xi_r, gs_r, gb_r, w0_r, *ws, o_ref=o_r, xi_scr=scr, sem=sem,
            counts=counts, f=f, precision=jax.lax.Precision.DEFAULT,
        )

    # activations (bf16) + weights + the DMA'd input tile, with headroom for
    # Mosaic's double buffering of the output block
    act_bytes = sum(2 * cnt * 4 * C for cnt in counts)
    vmem = act_bytes + len(w_arrays) * 2 * C * C * 2 + c0_pad * C * 4
    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xi16 — DMA'd manually
            pl.BlockSpec((1, 1, 8 * C), lambda bi, ti: (bi, 0, 0)),  # gs8
            pl.BlockSpec((1, 1, 8 * C), lambda bi, ti: (bi, 0, 0)),  # gb8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0big
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(w_arrays),
        out_specs=pl.BlockSpec(
            (1, f, C), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_final_pad, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((c0_pad // 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=min(int(vmem * 2.5), 110 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_tiles * sum(
                cnt * CONV_KERNEL[i] * C * C for i, cnt in enumerate(counts) if i
            ),
            bytes_accessed=xi16.size * 2 + b * t_final_pad * C * 2,
            transcendentals=b * n_tiles * sum(counts) * C,
        ),
        interpret=interpret,
    )(xi16, gs8, gb8, w0big, *w_arrays)
    return out[:, :t_final, :]
