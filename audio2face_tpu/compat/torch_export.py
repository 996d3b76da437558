"""Flax-params -> PyTorch-state-dict export (inverse of torch_convert).

Models trained in this framework can be loaded back into the reference's
PyTorch modules (same ``nn.Sequential`` naming as src/model/audio2face.py /
voca.py / song2face.py). Round-trip identity is pinned in tests.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    out[f"{name}.bias"] = _np(p["bias"])


def _linear(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).T
    out[f"{name}.bias"] = _np(p["bias"])


def _bn(out: dict, name: str, p: Mapping, stats: Mapping) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])
    out[f"{name}.running_mean"] = _np(stats["mean"])
    out[f"{name}.running_var"] = _np(stats["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)


def _lstm(out: dict, name: str, p: Mapping) -> None:
    out[f"{name}.weight_ih_l0"] = _np(p["w_ih"]).T
    out[f"{name}.weight_hh_l0"] = _np(p["w_hh"]).T
    out[f"{name}.bias_ih_l0"] = _np(p["b_ih"])
    out[f"{name}.bias_hh_l0"] = _np(p["b_hh"])


def _mlp_head(out: dict, prefix: str, p: Mapping) -> None:
    for fc, idx in (("fc0", 0), ("fc1", 1), ("fc2", 3), ("fc3", 4)):
        _linear(out, f"{prefix}.{idx}", p[fc])


def export_audio2mesh(variables: Mapping) -> dict[str, np.ndarray]:
    p, stats = variables["params"], variables.get("batch_stats", {})
    out: dict = {}
    for i, idx in enumerate((0, 3, 6, 9, 12)):
        _conv(out, f"analysis_net.{idx}", p[f"analysis{i}"]["conv"])
        _bn(out, f"analysis_net.{idx + 1}", p[f"analysis{i}_bn"]["bn"], stats[f"analysis{i}_bn"]["bn"])
    for i, (c_idx, b_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
        _conv(out, f"articulation_net.{c_idx}", p[f"artic{i}"]["conv"])
        _bn(out, f"articulation_net.{b_idx}", p[f"artic{i}_bn"]["bn"], stats[f"artic{i}_bn"]["bn"])
    _bn(out, "articulation_net.9", p["artic3_pre_bn"]["bn"], stats["artic3_pre_bn"]["bn"])
    _conv(out, "articulation_net.10", p["artic3"]["conv"])
    _bn(out, "articulation_net.12", p["artic4_pre_bn"]["bn"], stats["artic4_pre_bn"]["bn"])
    _conv(out, "articulation_net.13", p["artic4"]["conv"])
    _mlp_head(out, "output_net", p["output"])
    return out


def export_voca(variables: Mapping) -> dict[str, np.ndarray]:
    p = variables["params"]
    out: dict = {}
    for i, idx in enumerate((0, 2, 4, 6)):
        _conv(out, f"time_conv.{idx}", p[f"time_conv{i}"]["conv"])
    _mlp_head(out, "decoder", p["decoder"])
    return out


def export_song2face(variables: Mapping) -> dict[str, np.ndarray]:
    p, stats = variables["params"], variables.get("batch_stats", {})
    out: dict = {}
    for i in range(5):
        _conv(out, f"vocal_encoder_nn.{i}.0", p[f"enc{i}"]["conv"])
        _bn(out, f"vocal_encoder_nn.{i}.1", p[f"enc{i}_bn"]["bn"], stats[f"enc{i}_bn"]["bn"])
    _lstm(out, "vocal_encoder_lstm1", p["lstm1"])
    _lstm(out, "vocal_encoder_lstm2", p["lstm2"])
    for i in range(3):
        _conv(out, f"regression_net.{i}.0", p[f"reg{i}"]["conv"])
        _bn(out, f"regression_net.{i}.1", p[f"reg{i}_bn"]["bn"], stats[f"reg{i}_bn"]["bn"])
    _conv(out, "regression_net.3.0", p["reg3"]["conv"])
    _mlp_head(out, "output_net", p["output"])
    return out


def export_faceformer(variables: Mapping) -> dict[str, np.ndarray]:
    """Full-model export: decoder params plus the ``audio_encoder.*`` key set
    the reference's Faceformer expects (src/model/faceformer.py:104-109 loads
    the HF Wav2Vec2Model under that attribute), including the weight-norm
    re-parameterization of the positional conv. The cross-attention q/k
    projections are mathematically inert under the reference's diagonal
    memory mask and are exported as zeros."""
    from audio2face_tpu.compat.wav2vec2_convert import export_wav2vec2

    p = variables["params"]
    out: dict = {}
    d = p["dec_q_kernel"].shape[0]

    if "audio_encoder" in p:
        for k, v in export_wav2vec2(p["audio_encoder"]).items():
            out[f"audio_encoder.{k}"] = v

    def put(torch_name, flax_name, bias=True):
        out[f"{torch_name}.weight"] = _np(p[f"{flax_name}_kernel"]).T
        if bias:
            out[f"{torch_name}.bias"] = _np(p[f"{flax_name}_bias"])

    put("audio_feature_map", "audio_feature_map")
    put("vertice_map", "vertice_map")
    put("vertice_map_r", "vertice_map_r")
    put("obj_vector", "obj_vector", bias=False)

    layer = "transformer_decoder.layers.0"
    out[f"{layer}.self_attn.in_proj_weight"] = np.concatenate(
        [_np(p[f"dec_{n}_kernel"]).T for n in ("q", "k", "v")], axis=0
    )
    out[f"{layer}.self_attn.in_proj_bias"] = np.concatenate(
        [_np(p[f"dec_{n}_bias"]) for n in ("q", "k", "v")]
    )
    _linear(out, f"{layer}.self_attn.out_proj", {"kernel": p["dec_out_kernel"], "bias": p["dec_out_bias"]})
    cross_w = np.zeros((3 * d, d), np.float32)
    cross_b = np.zeros((3 * d,), np.float32)
    cross_w[2 * d :] = _np(p["cross_v_kernel"]).T
    cross_b[2 * d :] = _np(p["cross_v_bias"])
    if "cross_q_kernel" in p:  # biwi mode: live q/k projections round-trip
        cross_w[:d] = _np(p["cross_q_kernel"]).T
        cross_b[:d] = _np(p["cross_q_bias"])
        cross_w[d : 2 * d] = _np(p["cross_k_kernel"]).T
        cross_b[d : 2 * d] = _np(p["cross_k_bias"])
    out[f"{layer}.multihead_attn.in_proj_weight"] = cross_w
    out[f"{layer}.multihead_attn.in_proj_bias"] = cross_b
    _linear(out, f"{layer}.multihead_attn.out_proj", {"kernel": p["cross_out_kernel"], "bias": p["cross_out_bias"]})
    _linear(out, f"{layer}.linear1", {"kernel": p["linear1_kernel"], "bias": p["linear1_bias"]})
    _linear(out, f"{layer}.linear2", {"kernel": p["linear2_kernel"], "bias": p["linear2_bias"]})
    for i in (1, 2, 3):
        out[f"{layer}.norm{i}.weight"] = _np(p[f"norm{i}_scale"])
        out[f"{layer}.norm{i}.bias"] = _np(p[f"norm{i}_bias"])
    return out


_EXPORTERS = {
    "audio2mesh": export_audio2mesh,
    "voca": export_voca,
    "song2face": export_song2face,
    "faceformer": export_faceformer,
}


def export_state_dict(modelname: str, variables: Mapping) -> dict[str, np.ndarray]:
    """Flax variables -> reference-named numpy state dict (wrap values with
    torch.as_tensor to load into the PyTorch modules)."""
    try:
        return _EXPORTERS[modelname](variables)
    except KeyError:
        raise KeyError(
            f"No exporter for model {modelname!r}; available: {sorted(_EXPORTERS)}"
        ) from None
