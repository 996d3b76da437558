"""HF wav2vec2 PyTorch weights -> Flax Wav2Vec2Encoder params.

Handles both weight-norm naming schemes for the positional conv
(``weight_g``/``weight_v`` and the newer
``parametrizations.weight.original{0,1}``), folding g*v/||v|| into a plain
kernel — numerically identical at inference.

State-dict names follow HF ``Wav2Vec2Model`` (the reference loads
facebook/wav2vec2-base-960h at src/model/faceformer.py:104-109 and
src/model/extractor.py:78-83); keys may carry a ``wav2vec2.`` or
``audio_encoder.`` prefix which the caller strips.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _conv1d(sd, name, with_bias=True):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 1, 0)}  # (O,I,k)->(k,I,O)
    if with_bias:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _pos_conv_kernel(sd: Mapping[str, np.ndarray]) -> np.ndarray:
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g = sd[f"{base}.weight_g"]  # (O, 1, 1) or (1, 1, k) depending on torch ver
        v = sd[f"{base}.weight_v"]  # (O, I/groups, k)
    elif f"{base}.parametrizations.weight.original0" in sd:
        g = sd[f"{base}.parametrizations.weight.original0"]
        v = sd[f"{base}.parametrizations.weight.original1"]
    elif f"{base}.weight" in sd:
        return sd[f"{base}.weight"].transpose(2, 1, 0)
    else:
        raise KeyError(f"positional conv weights not found under {base}")
    # torch weight_norm(dim=2): per-kernel-position norm over (O, I) dims
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)
    return w.transpose(2, 1, 0)


def convert_wav2vec2(sd: Mapping[str, np.ndarray], num_layers: int = 12) -> dict:
    """HF Wav2Vec2Model state_dict (numpy) -> Flax params for Wav2Vec2Encoder."""
    params: dict = {}

    fe: dict = {}
    n_convs = sum(1 for k in sd if k.startswith("feature_extractor.conv_layers") and k.endswith("conv.weight"))
    for i in range(n_convs):
        fe[f"conv{i}"] = _conv1d(
            sd, f"feature_extractor.conv_layers.{i}.conv",
            with_bias=f"feature_extractor.conv_layers.{i}.conv.bias" in sd,
        )
    fe["group_norm"] = _ln(sd, "feature_extractor.conv_layers.0.layer_norm")
    params["feature_encoder"] = fe

    params["feature_projection"] = {
        "layer_norm": _ln(sd, "feature_projection.layer_norm"),
        "projection": _dense(sd, "feature_projection.projection"),
    }

    params["pos_conv_embed"] = {
        "conv": {
            "kernel": _pos_conv_kernel(sd),
            "bias": sd["encoder.pos_conv_embed.conv.bias"],
        }
    }
    params["layer_norm"] = _ln(sd, "encoder.layer_norm")

    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "q_proj": _dense(sd, f"{p}.attention.q_proj"),
            "k_proj": _dense(sd, f"{p}.attention.k_proj"),
            "v_proj": _dense(sd, f"{p}.attention.v_proj"),
            "out_proj": _dense(sd, f"{p}.attention.out_proj"),
            "layer_norm": _ln(sd, f"{p}.layer_norm"),
            "intermediate_dense": _dense(sd, f"{p}.feed_forward.intermediate_dense"),
            "output_dense": _dense(sd, f"{p}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }

    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = sd["masked_spec_embed"]
    else:
        params["masked_spec_embed"] = np.zeros((params["feature_projection"]["projection"]["kernel"].shape[1],), np.float32)
    return params


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Inverse direction: Flax Wav2Vec2Encoder params -> HF state-dict names.
# ---------------------------------------------------------------------------


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_wav2vec2(params: Mapping, num_layers: int = 12) -> dict[str, np.ndarray]:
    """Flax Wav2Vec2Encoder params -> HF ``Wav2Vec2Model`` state dict (numpy).

    Exact inverse of :func:`convert_wav2vec2`; the positional conv kernel is
    re-parameterized into torch's ``parametrizations.weight.original{0,1}``
    weight-norm form (dim=2: per-kernel-position norm over (O, I)), so
    ``g * v / ||v|| == w`` reproduces the folded kernel bit-for-bit at load.
    Lets FaceFormer models trained here load into the reference's module
    (src/model/faceformer.py:104-109 expects the full ``audio_encoder.*``
    key set).
    """
    sd: dict[str, np.ndarray] = {}

    fe = params["feature_encoder"]
    n_convs = sum(1 for k in fe if k.startswith("conv"))
    for i in range(n_convs):
        conv = fe[f"conv{i}"]
        sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = _np32(
            conv["kernel"]
        ).transpose(2, 1, 0)  # (k, I, O) -> (O, I, k)
        if "bias" in conv:
            sd[f"feature_extractor.conv_layers.{i}.conv.bias"] = _np32(conv["bias"])
    sd["feature_extractor.conv_layers.0.layer_norm.weight"] = _np32(fe["group_norm"]["scale"])
    sd["feature_extractor.conv_layers.0.layer_norm.bias"] = _np32(fe["group_norm"]["bias"])

    fp = params["feature_projection"]
    sd["feature_projection.layer_norm.weight"] = _np32(fp["layer_norm"]["scale"])
    sd["feature_projection.layer_norm.bias"] = _np32(fp["layer_norm"]["bias"])
    sd["feature_projection.projection.weight"] = _np32(fp["projection"]["kernel"]).T
    sd["feature_projection.projection.bias"] = _np32(fp["projection"]["bias"])

    w = _np32(params["pos_conv_embed"]["conv"]["kernel"]).transpose(2, 1, 0)  # (O, I/g, k)
    g = np.sqrt((w**2).sum(axis=(0, 1), keepdims=True))  # (1, 1, k)
    sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"] = g
    # torch weight-norm reconstructs w = g * v/||v||: an all-zero kernel
    # slice (g == 0) would make v/||v|| a 0/0 NaN, so give those slices a
    # unit direction — g = 0 still reproduces the zero weights exactly
    v = w.copy()
    zero = g[0, 0] == 0
    if zero.any():
        v[0, 0, zero] = 1.0
    sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"] = (
        v.astype(np.float32)
    )
    sd["encoder.pos_conv_embed.conv.bias"] = _np32(params["pos_conv_embed"]["conv"]["bias"])

    sd["encoder.layer_norm.weight"] = _np32(params["layer_norm"]["scale"])
    sd["encoder.layer_norm.bias"] = _np32(params["layer_norm"]["bias"])

    for i in range(num_layers):
        lp = params[f"layer{i}"]
        p = f"encoder.layers.{i}"
        for flax_name, torch_name in (
            ("q_proj", "attention.q_proj"),
            ("k_proj", "attention.k_proj"),
            ("v_proj", "attention.v_proj"),
            ("out_proj", "attention.out_proj"),
            ("intermediate_dense", "feed_forward.intermediate_dense"),
            ("output_dense", "feed_forward.output_dense"),
        ):
            sd[f"{p}.{torch_name}.weight"] = _np32(lp[flax_name]["kernel"]).T
            sd[f"{p}.{torch_name}.bias"] = _np32(lp[flax_name]["bias"])
        for flax_name, torch_name in (
            ("layer_norm", "layer_norm"),
            ("final_layer_norm", "final_layer_norm"),
        ):
            sd[f"{p}.{torch_name}.weight"] = _np32(lp[flax_name]["scale"])
            sd[f"{p}.{torch_name}.bias"] = _np32(lp[flax_name]["bias"])

    sd["masked_spec_embed"] = _np32(params["masked_spec_embed"])
    return sd
