"""Reference FaceFormer PyTorch checkpoint -> Flax params.

Source names follow the reference module attributes
(src/model/faceformer.py:104-135): ``audio_encoder.*`` (HF wav2vec2),
``audio_feature_map``, ``vertice_map``, ``vertice_map_r``, ``obj_vector``
(bias-free), and ``transformer_decoder.layers.0.*`` (a single torch
``nn.TransformerDecoderLayer`` with packed qkv in_proj).

The cross-attention q/k projections are mathematically inert under the
reference's diagonal-only memory mask (softmax over one element is 1
regardless of scores; enc_dec_mask at faceformer.py:58-66), so only the
value/out projections are converted. Buffers (``PPE.pe``, ``biased_mask``)
are deterministic and recomputed on the fly.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from audio2face_tpu.compat.wav2vec2_convert import convert_wav2vec2, strip_prefix

FEATURE_DIM = 64


def convert_faceformer(sd: Mapping[str, np.ndarray], dataset: str = "vocaset") -> dict:
    """``dataset="biwi"`` additionally converts the cross-attention q/k
    projections — live parameters under BIWI's 2-way alignment mask
    (enc_dec_mask BIWI arm, faceformer.py:60-62), inert under vocaset's
    diagonal."""
    d = FEATURE_DIM
    params: dict = {}

    params["audio_encoder"] = convert_wav2vec2(strip_prefix(sd, "audio_encoder."))

    def put_dense(name, torch_name, bias=True):
        params[f"{name}_kernel"] = sd[f"{torch_name}.weight"].T
        if bias:
            params[f"{name}_bias"] = sd[f"{torch_name}.bias"]

    put_dense("audio_feature_map", "audio_feature_map")
    put_dense("vertice_map", "vertice_map")
    put_dense("vertice_map_r", "vertice_map_r")
    put_dense("obj_vector", "obj_vector", bias=False)

    layer = "transformer_decoder.layers.0"
    in_w = sd[f"{layer}.self_attn.in_proj_weight"]  # (3d, d)
    in_b = sd[f"{layer}.self_attn.in_proj_bias"]
    for i, name in enumerate(("dec_q", "dec_k", "dec_v")):
        params[f"{name}_kernel"] = in_w[i * d : (i + 1) * d].T
        params[f"{name}_bias"] = in_b[i * d : (i + 1) * d]
    put_dense("dec_out", f"{layer}.self_attn.out_proj")

    cross_w = sd[f"{layer}.multihead_attn.in_proj_weight"]
    cross_b = sd[f"{layer}.multihead_attn.in_proj_bias"]
    params["cross_v_kernel"] = cross_w[2 * d : 3 * d].T
    params["cross_v_bias"] = cross_b[2 * d : 3 * d]
    if dataset == "biwi":
        params["cross_q_kernel"] = cross_w[0:d].T
        params["cross_q_bias"] = cross_b[0:d]
        params["cross_k_kernel"] = cross_w[d : 2 * d].T
        params["cross_k_bias"] = cross_b[d : 2 * d]
    put_dense("cross_out", f"{layer}.multihead_attn.out_proj")

    put_dense("linear1", f"{layer}.linear1")
    put_dense("linear2", f"{layer}.linear2")
    for i in (1, 2, 3):
        params[f"norm{i}_scale"] = sd[f"{layer}.norm{i}.weight"]
        params[f"norm{i}_bias"] = sd[f"{layer}.norm{i}.bias"]
    return {"params": params}
