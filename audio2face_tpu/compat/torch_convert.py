"""PyTorch-checkpoint -> Flax-params converters.

Maps reference state_dicts (module names as they appear in the PyTorch repo's
``nn.Sequential`` stacks — e.g. ``analysis_net.0.weight`` per
src/model/audio2face.py:13-29) onto this framework's Flax parameter trees, so
pretrained reference checkpoints run here with max per-vertex L2 < 1e-4
(BASELINE.md parity target).

Layout transforms:
- Conv2d weight (O, I, kH, kW) -> HWIO (kH, kW, I, O)
- Linear weight (out, in)      -> (in, out)
- BatchNorm weight/bias/running_mean/running_var ->
  params.{scale,bias} + batch_stats.{mean,var}
- LSTM weight_ih/hh (4H, F)    -> (F, 4H), same torch (i, f, g, o) gate order

Inputs are mappings name -> numpy array (use :func:`state_dict_to_numpy` on a
live torch module, or load a ``.ckpt``/``.pt`` file with
:func:`load_torch_checkpoint` — Lightning checkpoints carry a ``model.``
prefix, src/model/lightning_model.py:96,109).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def state_dict_to_numpy(module_or_dict) -> dict[str, np.ndarray]:
    """torch module or state_dict -> plain {name: np.ndarray}."""
    if hasattr(module_or_dict, "state_dict"):
        module_or_dict = module_or_dict.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in module_or_dict.items()}


def load_torch_checkpoint(path: str, strip_prefix: str = "model.") -> dict[str, np.ndarray]:
    """Load a torch/Lightning checkpoint file into numpy arrays, stripping the
    LightningModule's ``model.`` attribute prefix."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if strip_prefix and k.startswith(strip_prefix):
            k = k[len(strip_prefix):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().float().numpy()
    return out


def _conv(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{name}.bias"],
    }


def _linear(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _bn(sd: Mapping[str, np.ndarray], name: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _lstm(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "w_ih": sd[f"{name}.weight_ih_l0"].T,
        "w_hh": sd[f"{name}.weight_hh_l0"].T,
        "b_ih": sd[f"{name}.bias_ih_l0"],
        "b_hh": sd[f"{name}.bias_hh_l0"],
    }


def _mlp_head(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    # Sequential [Linear, Linear, Tanh, Linear, Linear] -> indices 0, 1, 3, 4
    return {
        "fc0": _linear(sd, f"{prefix}.0"),
        "fc1": _linear(sd, f"{prefix}.1"),
        "fc2": _linear(sd, f"{prefix}.3"),
        "fc3": _linear(sd, f"{prefix}.4"),
    }


def convert_audio2mesh(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference Audio2Mesh state_dict -> {'params', 'batch_stats'} variables.

    Reference layer indices: analysis_net convs at 0,3,6,9,12 / BNs at
    1,4,7,10,13 (src/model/audio2face.py:13-29); articulation_net convs at
    0,3,6,10,13 / BNs at 1,4,7,9,12 (:31-47); output_net linears at 0,1,3,4.
    """
    params: dict = {}
    stats: dict = {}
    for i, idx in enumerate((0, 3, 6, 9, 12)):
        params[f"analysis{i}"] = {"conv": _conv(sd, f"analysis_net.{idx}")}
        p, s = _bn(sd, f"analysis_net.{idx + 1}")
        params[f"analysis{i}_bn"] = {"bn": p}
        stats[f"analysis{i}_bn"] = {"bn": s}
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7))):
        params[f"artic{i}"] = {"conv": _conv(sd, f"articulation_net.{conv_idx}")}
        p, s = _bn(sd, f"articulation_net.{bn_idx}")
        params[f"artic{i}_bn"] = {"bn": p}
        stats[f"artic{i}_bn"] = {"bn": s}
    p, s = _bn(sd, "articulation_net.9")
    params["artic3_pre_bn"] = {"bn": p}
    stats["artic3_pre_bn"] = {"bn": s}
    params["artic3"] = {"conv": _conv(sd, "articulation_net.10")}
    p, s = _bn(sd, "articulation_net.12")
    params["artic4_pre_bn"] = {"bn": p}
    stats["artic4_pre_bn"] = {"bn": s}
    params["artic4"] = {"conv": _conv(sd, "articulation_net.13")}
    params["output"] = _mlp_head(sd, "output_net")
    return {"params": params, "batch_stats": stats}


def convert_voca(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference VOCA state_dict (src/model/voca.py:19-36): time_conv convs at
    0,2,4,6; decoder linears at 0,1,3,4. No BatchNorm."""
    params: dict = {}
    for i, idx in enumerate((0, 2, 4, 6)):
        params[f"time_conv{i}"] = {"conv": _conv(sd, f"time_conv.{idx}")}
    params["decoder"] = _mlp_head(sd, "decoder")
    return {"params": params, "batch_stats": {}}


def convert_song2face(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference Song2Face state_dict (src/model/song2face.py:31-57): each
    vocal_encoder_nn.{i} / regression_net.{i} is a nested Sequential
    [conv, (bn), relu]; two LSTMs; output_net head."""
    params: dict = {}
    stats: dict = {}
    for i in range(5):
        params[f"enc{i}"] = {"conv": _conv(sd, f"vocal_encoder_nn.{i}.0")}
        p, s = _bn(sd, f"vocal_encoder_nn.{i}.1")
        params[f"enc{i}_bn"] = {"bn": p}
        stats[f"enc{i}_bn"] = {"bn": s}
    params["lstm1"] = _lstm(sd, "vocal_encoder_lstm1")
    params["lstm2"] = _lstm(sd, "vocal_encoder_lstm2")
    for i in range(3):
        params[f"reg{i}"] = {"conv": _conv(sd, f"regression_net.{i}.0")}
        p, s = _bn(sd, f"regression_net.{i}.1")
        params[f"reg{i}_bn"] = {"bn": p}
        stats[f"reg{i}_bn"] = {"bn": s}
    params["reg3"] = {"conv": _conv(sd, "regression_net.3.0")}
    params["output"] = _mlp_head(sd, "output_net")
    return {"params": params, "batch_stats": stats}


_MODEL_CONVERTERS = {
    "audio2mesh": convert_audio2mesh,
    "voca": convert_voca,
    "song2face": convert_song2face,
}


def convert_state_dict(modelname: str, sd: Mapping[str, np.ndarray]) -> dict:
    """Dispatch by model name. For faceformer see
    :func:`audio2face_tpu.compat.faceformer_convert.convert_faceformer`."""
    if modelname == "faceformer":
        from audio2face_tpu.compat.faceformer_convert import convert_faceformer

        return convert_faceformer(sd)
    try:
        return _MODEL_CONVERTERS[modelname](sd)
    except KeyError:
        raise KeyError(f"No converter for model {modelname!r}") from None
