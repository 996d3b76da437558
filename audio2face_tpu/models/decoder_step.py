"""The FaceFormer per-frame decoder step, shared by every KV-cached
serving path.

``streaming.py`` (one live stream) and ``multistream.py`` (a pooled slot
batch) both scan this step; factoring it here keeps the numerically
sensitive decode math — pre-composed feedback projection, q/k/v against the
growing cache, period-bucketed ALiBi attention, the three parameter
layer-norms and the ReLU FFN — in ONE place, so the single-stream and
pooled paths can never silently diverge from each other or from the
oracle.

Semantics: the KV-cached O(T) equivalent of the attention the reference's
per-frame recompute loop performs for the newest position
(src/model/faceformer.py:154-185), proven against the naive torch-style
loop in ``tests/test_faceformer.py`` and against offline decode in
``tests/test_streaming.py`` / ``tests/test_multistream.py``.

Parameter tree ``p`` is the flat serving-param dict both callers build
(``dec_{q,k,v,out}_{kernel,bias}``, ``norm{1,2,3}_{scale,bias}``,
``linear{1,2}_{kernel,bias}``, ``vertice_map*``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from audio2face_tpu.models.faceformer import (
    FEATURE_DIM,
    N_HEADS,
    PERIOD,
    periodic_positional_encoding,
)
from audio2face_tpu.ops.attention import decode_step_attention


def make_decoder_step(
    p: dict,
    *,
    styles: jnp.ndarray,
    t0: jnp.ndarray,
    n_valid: Optional[jnp.ndarray] = None,
    t_scratch: Optional[int] = None,
):
    """Build the ``lax.scan`` body advancing a batch of S decoder states by
    one frame each.

    carry: ``(emb (S, d), k_cache (S, H, Tmax, hd), v_cache (S, H, Tmax, hd))``
    xs item: ``(i, cross_t)`` — the scalar scan index and the (S, d)
    cross-attention output for local frame i.
    styles: (S, d) per-stream style embeddings added into the feedback.
    t0: (S,) absolute start frames (stream j decodes frame ``t0[j] + i``).
    n_valid: optional (S,) valid frame counts. Streams with ``i >= n_valid``
        are masked off: their k/v write lands in cache row ``t_scratch``
        (which must exceed every active position so the causal mask never
        admits it) and their carried embedding is ``where``-frozen — an
        idle slot is bit-identical to one that never stepped. ``None``
        means every stream decodes all scanned frames.

    Yields ``h`` (S, d), the pre-vertex-head hidden state per frame; the
    caller applies its own output head.
    """
    if n_valid is not None and t_scratch is None:
        # a defaulted scratch row of 0 would be a VALID cache position the
        # causal mask attends on every later step — masked-off streams
        # would silently corrupt the active prefix; force callers to pick
        # a row past every active position (the cache length works)
        raise ValueError("n_valid requires t_scratch (a cache row beyond "
                         "every active position, e.g. the cache length - 1)")
    d = FEATURE_DIM
    hd = d // N_HEADS
    pe = jnp.asarray(periodic_positional_encoding())
    # the reference composes feedback as two chained linears; pre-composing
    # them is exact (both are affine) and halves the per-step matvecs
    fb_k = p["vertice_map_r_kernel"] @ p["vertice_map_kernel"]
    fb_b = p["vertice_map_r_bias"] @ p["vertice_map_kernel"] + p["vertice_map_bias"]

    def layer_norm(x, name):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p[f"{name}_scale"] + p[f"{name}_bias"]

    upd = jax.vmap(
        lambda c, u, idx: jax.lax.dynamic_update_index_in_dim(c, u, idx, axis=1)
    )

    def step(carry, xt):
        emb, kc, vc = carry
        i, cross_t = xt  # i: scalar local frame; cross_t: (S, d)
        s = emb.shape[0]
        t = t0 + i  # (S,) per-stream absolute frame
        x = emb + pe[t % PERIOD]  # (S, d)
        q = (x @ p["dec_q_kernel"] + p["dec_q_bias"]).reshape(s, N_HEADS, hd)
        k = (x @ p["dec_k_kernel"] + p["dec_k_bias"]).reshape(s, N_HEADS, hd)
        v = (x @ p["dec_v_kernel"] + p["dec_v_bias"]).reshape(s, N_HEADS, hd)
        if n_valid is None:
            t_write = t
        else:
            t_write = jnp.where(i < n_valid, t, t_scratch)
        kc = upd(kc, k, t_write)
        vc = upd(vc, v, t_write)
        attn = decode_step_attention(q, kc, vc, t, alibi_period=PERIOD)
        sa = attn.reshape(s, d) @ p["dec_out_kernel"] + p["dec_out_bias"]
        h = layer_norm(x + sa, "norm1")
        h = layer_norm(h + cross_t, "norm2")
        ff = jnp.maximum(h @ p["linear1_kernel"] + p["linear1_bias"], 0.0)
        ff = ff @ p["linear2_kernel"] + p["linear2_bias"]
        h = layer_norm(h + ff, "norm3")
        emb_next = h @ fb_k + fb_b + styles
        if n_valid is not None:
            emb_next = jnp.where((i < n_valid)[:, None], emb_next, emb)
        return (emb_next, kc, vc), h

    return step
