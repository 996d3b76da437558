"""FaceFormer — wav2vec2 encoder + autoregressive mesh-transformer decoder.

Semantics parity with the reference (src/model/faceformer.py:91-188), which
runs a per-frame Python loop re-decoding the full prefix every step with a
precomputed 600x600 biased mask (O(T^2) recompute per step, O(T^3) total —
faceformer.py:154-185, hard-capped at 10 s). Because the decoder is causally
masked, position t's output is prefix-invariant, so the loop is exactly
equivalent to a single sequential pass computing each position once. This
implementation is that pass, TPU-native:

- ``jax.lax.scan`` over frames with a KV cache — O(T) steps of O(T) attention
  (total O(T^2) instead of O(T^3)), no sequence cap: 60 s+ clips decode
  on-chip.
- The period-bucketed ALiBi bias (faceformer.py:22-54) is computed on the
  fly — no mask table.
- The diagonal-only cross-attention (enc_dec_mask, faceformer.py:58-66) makes
  every cross softmax a single unmasked element with weight 1, so cross
  attention reduces *exactly* to ``out_proj(v_proj(memory[t]))`` — hoisted out
  of the scan as one batched MXU matmul.
- The per-step feedback ``emb_{t+1} = vertice_map(vertice_map_r(h_t)) + style``
  (faceformer.py:181-185 with zero-init maps :132-135) factors through the
  15069-dim vertex space; inside the scan we use the composed 64x64 matrix
  ``Wr @ Wm`` and emit h_t, then produce vertices after the scan as a single
  (B*T, 64) @ (64, 15069) MXU matmul.
- Periodic positional encoding (faceformer.py:70-88) is a (60, 64) constant
  indexed mod period.
- Batched: everything carries a batch axis (the reference is hard-wired to
  batch 1, train.py:33); padded items use ``lengths`` (samples) and the
  returned frame mask.

Training backprops through the scan (reference trains through the full
autoregressive unroll — no teacher forcing); the step is rematerialized to
keep activation memory O(T) instead of O(T * layers).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio2face_tpu.models.layers import dot_precision
from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.ops.dsp import wav2vec2_zero_mean_unit_var

FEATURE_DIM = 64
N_HEADS = 4
PERIOD = 60
FPS = 60
AUDIO_SR = 16000


def periodic_positional_encoding(period: int = PERIOD, d_model: int = FEATURE_DIM) -> np.ndarray:
    """The (period, d_model) sinusoid table of the reference PPE
    (src/model/faceformer.py:70-88); position t uses row t % period."""
    position = np.arange(period, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((period, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def normalize_waveform(
    audio: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Wav2Vec2Processor zero-mean/unit-var normalization, masked to the
    valid prefix for padded batches — the exact pre-encoder step of
    ``FaceFormer.__call__`` (reference host round-trip: faceformer.py:142-144),
    exposed for callers that run the encoder externally (sequence-parallel
    serving)."""
    if lengths is None:
        return wav2vec2_zero_mean_unit_var(audio)
    n_samples = audio.shape[1]
    valid = (jnp.arange(n_samples)[None, :] < lengths[:, None]).astype(jnp.float32)
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
    mean = jnp.sum(audio * valid, axis=1, keepdims=True) / n
    var = jnp.sum(jnp.square(audio - mean) * valid, axis=1, keepdims=True) / n
    return (audio - mean) / jnp.sqrt(var + 1e-7) * valid


def frame_count(n_samples, fps: int = FPS):
    """frame_num = samples * fps // 16000 (reference: faceformer.py:141,
    fps=60 for VOCASET; BIWI animates at 25 fps).

    Accepts python ints or integer arrays. Evaluated as
    ``q*fps + r*fps//SR`` (exact for non-negative inputs: n = q*SR + r ⇒
    n*fps//SR = q*fps + (r*fps)//SR) so int32 sample-count ARRAYS cannot
    overflow — ``n*60`` wraps at only ~37 minutes of audio, and
    sequence-parallel serving exists precisely for longer clips (x64 is
    off, so the naive expression would wrap silently)."""
    q, r = n_samples // AUDIO_SR, n_samples % AUDIO_SR
    return q * fps + r * fps // AUDIO_SR


def select_decode_impl(
    decode_impl: Optional[str], *, train: bool, backend: str, batch: int,
    n_frames: int, dataset: str = "vocaset",
) -> str:
    """Pick the decode implementation for a (batch, frames) trace.

    Training always differentiates through the lax.scan path. Inference
    auto-selection (decode_impl=None) uses the fused Pallas mega-kernel on
    TPU only when its VMEM-resident KV/cross/out buffers actually fit the
    Mosaic window (ops/decode_kernel.fits_vmem) — longer clips (batch-8
    past ~2.3 min, single-stream past ~9 min) fall back to the scan, which
    is correct at any length. An EXPLICIT decode_impl="fused" is honored
    as requested; the kernel raises a capacity ValueError at trace time
    rather than dying in a Mosaic OOM. BIWI mode runs the kernel's 2-way
    cross-softmax variant (its mem_k/mem_v buffers are 2T-high, so its
    VMEM ceiling arrives at shorter clips)."""
    if train:
        return "scan"
    biwi = dataset == "biwi"
    if decode_impl is None:
        from audio2face_tpu.ops.decode_kernel import fits_vmem

        return (
            "fused"
            if (backend == "tpu" and fits_vmem(batch, n_frames, biwi=biwi))
            else "scan"
        )
    return decode_impl


class FaceFormer(nn.Module):
    n_verts: int
    n_onehot: int
    dtype: jnp.dtype | None = None
    # checkpoint the decode scan at chunk granularity in training (sqrt
    # remat over the frame axis — see the scan construction). False turns
    # the chunk checkpoint off (residuals for every step of every chunk are
    # kept; only viable for small B*T^2). True/None both mean the default
    # chunked checkpointing.
    remat_scan: Optional[bool] = None
    # "scan" | "fused" | None (auto: fused Pallas mega-kernel for inference
    # on TPU — the whole decode loop runs in one kernel with VMEM-resident
    # KV caches; training always uses the differentiable scan)
    decode_impl: Optional[str] = None
    # "vocaset" (reference main path, hardcoded at faceformer.py:101) or
    # "biwi" — the reference's OTHER alignment mode, dead code behind its
    # hardcoded dataset string but present in both branches it vendored
    # (enc_dec_mask BIWI arm, faceformer.py:60-62: mesh frame t
    # cross-attends audio latents {2t, 2t+1} with a true 2-way softmax —
    # 25 fps video against 50 fps features, no interpolation — and the
    # wav2vec trim branch, wav2vec.py:119-124). BIWI mode adds cross_q /
    # cross_k parameters (the vocaset diagonal makes them mathematically
    # inert, so vocaset checkpoints omit them), runs frames at 25 fps, and
    # always decodes on the scan path.
    dataset: str = "vocaset"
    # PPE / ALiBi bucket period (reference hardcodes 60, faceformer.py:102;
    # the upstream FaceFormer uses 25 for BIWI)
    period: int = PERIOD

    def _dense_params(self, name: str, d_in: int, d_out: int, *, bias: bool = True, zeros: bool = False):
        init_k = nn.initializers.zeros if zeros else nn.initializers.lecun_normal()
        kernel = self.param(f"{name}_kernel", init_k, (d_in, d_out))
        if not bias:
            return kernel, None
        b = self.param(f"{name}_bias", nn.initializers.zeros, (d_out,))
        return kernel, b

    def _ln_params(self, name: str, d: int):
        scale = self.param(f"{name}_scale", nn.initializers.ones, (d,))
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (d,))
        return scale, bias

    @nn.compact
    def __call__(
        self,
        audio: jnp.ndarray,  # (B, S) float waveform @ 16 kHz
        one_hot: jnp.ndarray,  # (B, n_onehot)
        template: jnp.ndarray,  # (B, V, 3)
        lengths: Optional[jnp.ndarray] = None,  # (B,) valid sample counts
        *,
        train: bool = False,
        use_pallas: Optional[bool] = None,
        return_hidden: bool = False,
        encoder_hidden: Optional[jnp.ndarray] = None,
    ):
        """Returns (B, T, V, 3) vertices with T = frame_count(S), plus a
        (B, T) frame validity mask when ``lengths`` is given.

        ``return_hidden=True`` returns the decoder hidden states (B, T, 64)
        instead of vertices: the vertex head is a single (64, 3V) matmul
        whose OUTPUT is the memory monster — (B, T, V, 3) f32 is ~17 GB for
        8x 3-minute clips, past HBM — so long-clip serving applies the head
        per time-chunk outside the model (serving.py) while everything
        upstream stays one compiled program."""
        d = FEATURE_DIM
        biwi = self.dataset == "biwi"
        fps = 25 if biwi else FPS
        bsz, n_samples = audio.shape
        n_frames = frame_count(n_samples, fps)

        # ---- encoder ----------------------------------------------------
        # Wav2Vec2Processor normalization stays on-chip (reference does a
        # host numpy round-trip, faceformer.py:142-144)
        frame_lengths = None if lengths is None else frame_count(lengths, fps)
        if encoder_hidden is not None:
            # externally-computed hidden states (sequence-parallel serving:
            # parallel/sequence.py time-shards the encoder over the mesh;
            # caller normalized with normalize_waveform)
            hidden = encoder_hidden
        else:
            norm_audio = normalize_waveform(audio, lengths)
            hidden = Wav2Vec2Encoder(Wav2Vec2Config(), dtype=self.dtype, name="audio_encoder")(
                norm_audio, output_len=n_frames, lengths=lengths,
                output_lengths=None if biwi else frame_lengths,
                dataset=self.dataset,
                train=train, apply_spec_augment=train, use_pallas=use_pallas,
            )  # (B, T, 768) — biwi: (B, <=2T, 768), 50 fps latents untouched
        if biwi and hidden.shape[1] != 2 * n_frames:
            # static-shape completion of the reference trim branch: the
            # 2-way alignment needs exactly 2 latents per frame. Short
            # encodes zero-pad at the end (the torch original would build a
            # fully-masked cross row there and NaN — not reproduced).
            pad = 2 * n_frames - hidden.shape[1]
            hidden = jnp.pad(hidden, ((0, 0), (0, max(pad, 0)), (0, 0)))[
                :, : 2 * n_frames
            ]

        prec = dot_precision(self.dtype)

        def mm(a, b):
            return jnp.matmul(a, b, precision=prec)

        afm_k, afm_b = self._dense_params("audio_feature_map", 768, d)
        memory = mm(hidden, afm_k) + afm_b  # (B, T, 64)

        # ---- decoder params ---------------------------------------------
        obj_k, _ = self._dense_params("obj_vector", self.n_onehot, d, bias=False)
        vm_k, vm_b = self._dense_params("vertice_map", self.n_verts, d, zeros=True)
        vmr_k, vmr_b = self._dense_params("vertice_map_r", d, self.n_verts, zeros=True)

        q_k, q_b = self._dense_params("dec_q", d, d)
        k_k, k_b = self._dense_params("dec_k", d, d)
        v_k, v_b = self._dense_params("dec_v", d, d)
        o_k, o_b = self._dense_params("dec_out", d, d)
        cv_k, cv_b = self._dense_params("cross_v", d, d)
        co_k, co_b = self._dense_params("cross_out", d, d)
        f1_k, f1_b = self._dense_params("linear1", d, 2 * d)
        f2_k, f2_b = self._dense_params("linear2", 2 * d, d)
        ln1 = self._ln_params("norm1", d)
        ln2 = self._ln_params("norm2", d)
        ln3 = self._ln_params("norm3", d)

        compute_dtype = self.dtype or jnp.float32

        def layer_norm(x, scale_bias):
            scale, bias = scale_bias
            x32 = x.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias).astype(x.dtype)

        hd = d // N_HEADS
        if biwi:
            # true 2-way cross softmax (enc_dec_mask BIWI arm,
            # faceformer.py:60-62): q/k projections are live parameters.
            # K/V over the whole memory are precomputed outside the scan;
            # each step gathers latent rows {2t, 2t+1}.
            cq_k, cq_b = self._dense_params("cross_q", d, d)
            ck_k, ck_b = self._dense_params("cross_k", d, d)
            cq_k, cq_b = cq_k.astype(compute_dtype), cq_b.astype(compute_dtype)
            mem_k = (
                (mm(memory, ck_k) + ck_b)
                .reshape(bsz, -1, N_HEADS, hd)
                .transpose(0, 2, 1, 3)
                .astype(compute_dtype)
            )  # (B, H, S, hd)
            mem_v = (
                (mm(memory, cv_k) + cv_b)
                .reshape(bsz, -1, N_HEADS, hd)
                .transpose(0, 2, 1, 3)
                .astype(compute_dtype)
            )
            co_kc, co_bc = co_k.astype(compute_dtype), co_b.astype(compute_dtype)
            cross = None
        else:
            # cross attention hoisted out of the scan: diagonal mask =>
            # weight-1 softmax over memory[t] only (see module docstring)
            cross = (mm(mm(memory, cv_k) + cv_b, co_k) + co_b).astype(compute_dtype)  # (B, T, 64)

        # composed 64x64 feedback: vertice_map(vertice_map_r(h)) =
        # h @ (Wr @ Wm) + (br @ Wm + bm)
        fb_k = mm(vmr_k, vm_k).astype(compute_dtype)
        fb_b = (mm(vmr_b, vm_k) + vm_b).astype(compute_dtype)

        # decoder params in compute precision (params stay f32 in the tree)
        q_k, q_b, k_k, k_b, v_k, v_b, o_k, o_b, f1_k, f1_b, f2_k, f2_b = (
            p.astype(compute_dtype)
            for p in (q_k, q_b, k_k, k_b, v_k, v_b, o_k, o_b, f1_k, f1_b, f2_k, f2_b)
        )

        style = mm(one_hot, obj_k).astype(compute_dtype)  # (B, 64)
        pe = jnp.asarray(
            periodic_positional_encoding(self.period), dtype=compute_dtype
        )


        decode_impl = select_decode_impl(
            self.decode_impl, train=train, backend=jax.default_backend(),
            batch=bsz, n_frames=n_frames, dataset=self.dataset,
        )
        if decode_impl == "fused" and not train:
            from audio2face_tpu.ops.decode_kernel import faceformer_decode_loop

            kernel_weights = {
                "q_kernel": q_k, "q_bias": q_b,
                "k_kernel": k_k, "k_bias": k_b,
                "v_kernel": v_k, "v_bias": v_b,
                "o_kernel": o_k, "o_bias": o_b,
                "f1_kernel": f1_k, "f1_bias": f1_b,
                "f2_kernel": f2_k, "f2_bias": f2_b,
                "fb_kernel": fb_k, "fb_bias": fb_b,
                "ln1_scale": ln1[0], "ln1_bias": ln1[1],
                "ln2_scale": ln2[0], "ln2_bias": ln2[1],
                "ln3_scale": ln3[0], "ln3_bias": ln3[1],
            }
            if biwi:
                kernel_weights.update(
                    cq_kernel=cq_k, cq_bias=cq_b, co_kernel=co_kc, co_bias=co_bc
                )
            hs = faceformer_decode_loop(
                None if biwi else cross, style, pe, kernel_weights,
                period=self.period,
                fast_math=self.dtype is not None,
                mem_k=mem_k if biwi else None,
                mem_v=mem_v if biwi else None,
            )
            if return_hidden:
                return self._hidden_out(hs, n_frames, frame_lengths, lengths)
            return self._vertex_head(hs, vmr_k, vmr_b, template, bsz, n_frames, frame_lengths, lengths)

        # ---- per-step inputs hoisted out of the scan ---------------------
        # Every per-step gather/RNG the loop body used to do is precomputed
        # as scan xs: the PPE row, the cross term, and (training) the five
        # dropout keep-masks. Inside a 600-step scan each threefry bernoulli
        # and dynamic_index costs real per-iteration latency; as xs they are
        # one fused vectorized pass and the scan slices them for free.
        ts = jnp.arange(n_frames)
        xs = {"t": ts, "pe": pe[ts % self.period]}  # (T,), (T, 64)
        if biwi:
            # latents {2t, 2t+1} per step: (B, H, 2T, hd) -> (T, B, H, 2, hd)
            xs["mem_k"] = mem_k.reshape(
                bsz, N_HEADS, n_frames, 2, hd
            ).transpose(2, 0, 1, 3, 4)
            xs["mem_v"] = mem_v.reshape(
                bsz, N_HEADS, n_frames, 2, hd
            ).transpose(2, 0, 1, 3, 4)
        else:
            xs["cross"] = jnp.swapaxes(cross, 0, 1)  # (T, B, 64)
        if train:
            r = jax.random.split(self.make_rng("dropout"), 5)

            def keep(rng, shape, p=0.1):
                m = jax.random.bernoulli(rng, 1.0 - p, shape)
                return (m / (1.0 - p)).astype(compute_dtype)

            # PPE dropout (faceformer.py:72,86-88); torch decoder-layer
            # dropout1/dropout2, FFN inner, dropout3
            xs["m_pe"] = keep(r[0], (n_frames, bsz, d))
            xs["m_sa"] = keep(r[1], (n_frames, bsz, d))
            xs["m_ca"] = keep(r[2], (n_frames, bsz, d))
            xs["m_ff1"] = keep(r[3], (n_frames, bsz, 2 * d))
            xs["m_ff2"] = keep(r[4], (n_frames, bsz, d))

        # fused QKV projection: one (B, 64) @ (64, 192) per step
        qkv_k = jnp.concatenate([q_k, k_k, v_k], axis=1)
        qkv_b = jnp.concatenate([q_b, k_b, v_b])

        # slopes/positions for the in-step attention (semantics identical to
        # ops.attention.decode_step_attention, inlined over the combined
        # (B, T, 2*64) KV carry — see layout note at `init` below)
        from audio2face_tpu.ops.attention import DEFAULT_MASK_VALUE, alibi_slopes

        slopes = jnp.asarray(alibi_slopes(N_HEADS))
        pos_j = jnp.arange(n_frames)

        def step(carry, xt):
            emb, kv_cache = carry
            t = xt["t"]
            x = emb + xt["pe"]  # (B, 64)
            if train:
                x = x * xt["m_pe"]

            qkv = mm(x, qkv_k) + qkv_b  # (B, 192); lanes are h*hd + i
            q = qkv[:, :d].reshape(bsz, N_HEADS, hd)
            kv_cache = jax.lax.dynamic_update_index_in_dim(
                kv_cache, qkv[:, d:], t, axis=1
            )
            kmat = kv_cache[..., :d].reshape(bsz, n_frames, N_HEADS, hd)
            vmat = kv_cache[..., d:].reshape(bsz, n_frames, N_HEADS, hd)
            s = jnp.einsum(
                "bhd,bthd->bht", q, kmat,
                preferred_element_type=jnp.float32, precision=prec,
            ) * (1.0 / math.sqrt(hd))
            dist = jnp.floor_divide(t - pos_j, self.period).astype(jnp.float32)
            s = s - slopes[None, :, None] * dist[None, None, :]
            s = jnp.where(pos_j[None, None, :] <= t, s, DEFAULT_MASK_VALUE)
            p = jax.nn.softmax(s, axis=-1)
            attn = jnp.einsum(
                "bht,bthd->bhd", p.astype(vmat.dtype), vmat, precision=prec
            )
            sa = mm(attn.reshape(bsz, d), o_k) + o_b
            if train:
                sa = sa * xt["m_sa"]
            h = layer_norm(x + sa, ln1)
            if biwi:
                # 2-way cross softmax over latents {2t, 2t+1}
                qc = (mm(h, cq_k) + cq_b).reshape(bsz, N_HEADS, 1, hd)
                k2, v2 = xt["mem_k"], xt["mem_v"]
                scores = jnp.einsum(
                    "bhqe,bhke->bhqk", qc, k2, precision=prec
                ) / math.sqrt(hd)
                w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
                    qc.dtype
                )
                ca_h = jnp.einsum("bhqk,bhke->bhqe", w, v2, precision=prec)
                ca = mm(ca_h.reshape(bsz, d), co_kc) + co_bc
            else:
                ca = xt["cross"]
            if train:
                ca = ca * xt["m_ca"]
            h = layer_norm(h + ca, ln2)
            ff = jnp.maximum(mm(h, f1_k) + f1_b, 0.0)
            if train:
                ff = ff * xt["m_ff1"]
            ff = mm(ff, f2_k) + f2_b
            if train:
                ff = ff * xt["m_ff2"]
            h = layer_norm(h + ff, ln3)

            emb_next = mm(h, fb_k) + fb_b + style
            return (emb_next, kv_cache), h

        # combined lane-exact KV carry: (B, T, 128) — the k/v halves pack on
        # the 128-lane axis with ZERO tile padding. Differentiating a scan
        # stacks the carry per step as a residual, so carry layout is the
        # whole memory story: the previous (B, H, T, hd) pair stacked to
        # bf16[T, B, 4, T, 16] — an 8x tile-padding blowup (trailing dim
        # 16), 8.2 GB at bs=12 x 600 frames.
        init = (
            style,  # emb_0 = obj embedding (faceformer.py:156-157)
            jnp.zeros((bsz, n_frames, 2 * d), compute_dtype),
        )
        if train:
            # sqrt-remat over the frame axis: an outer scan over chunks
            # checkpoints at CHUNK granularity, so the O(T) per-step carries
            # live only transiently inside one chunk's backward recompute —
            # residual memory is O(T^2/chunk) instead of O(T^2). This is
            # what makes long-clip (60 s+) and large-batch whole-clip
            # training fit HBM at all.
            c = min(64, n_frames)
            while c > 1 and n_frames % c:
                c -= 1
            n_chunks = n_frames // c
            xs_c = jax.tree.map(
                lambda a: a.reshape((n_chunks, c) + a.shape[1:]), xs
            )

            def chunk_body(carry, xsc):
                return jax.lax.scan(step, carry, xsc)

            if self.remat_scan is not False:
                chunk_body = jax.checkpoint(chunk_body)
            (_, _), hs = jax.lax.scan(chunk_body, init, xs_c)
            hs = hs.reshape((n_frames,) + hs.shape[2:])
        else:
            (_, _), hs = jax.lax.scan(step, init, xs)
        hs = jnp.swapaxes(hs, 0, 1)  # (B, T, 64)
        if return_hidden:
            return self._hidden_out(hs, n_frames, frame_lengths, lengths)
        return self._vertex_head(hs, vmr_k, vmr_b, template, bsz, n_frames, frame_lengths, lengths)

    def _hidden_out(self, hs, n_frames, frame_lengths, lengths):
        if lengths is not None:
            frame_mask = (jnp.arange(n_frames)[None, :] < frame_lengths[:, None]).astype(jnp.float32)
            return hs, frame_mask
        return hs

    def _vertex_head(self, hs, vmr_k, vmr_b, template, bsz, n_frames, frame_lengths, lengths):
        """Vertex head as one big MXU matmul after the decode loop."""
        d = FEATURE_DIM
        verts = (
            jnp.matmul(hs.reshape(-1, d), vmr_k, precision=dot_precision(self.dtype))
            + vmr_b
        ).reshape(bsz, n_frames, -1)
        verts = verts.astype(jnp.float32) + template.reshape(bsz, 1, -1)
        verts = verts.reshape(bsz, n_frames, -1, 3)

        if lengths is not None:
            frame_mask = (jnp.arange(n_frames)[None, :] < frame_lengths[:, None]).astype(jnp.float32)
            return verts, frame_mask
        return verts
