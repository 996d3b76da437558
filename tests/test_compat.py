"""Checkpoint-file compatibility: Lightning-style .ckpt -> Experiment."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio2face_tpu.compat.torch_convert import convert_state_dict, load_torch_checkpoint


def test_lightning_ckpt_roundtrip_voca(tmp_path):
    """A Lightning checkpoint carries the LightningModule's ``model.``
    attribute prefix (lightning_model.py:96,109) plus extractor buffers;
    load_torch_checkpoint must strip/skip them and the converted params must
    reproduce the torch forward."""
    from tests.torch_mirrors import TorchVoca
    from audio2face_tpu.models import Voca

    torch.manual_seed(0)
    mirror = TorchVoca(15069, 12)
    sd = {f"model.{k}": v for k, v in mirror.state_dict().items()}
    # simulate extractor buffers riding along in the checkpoint
    sd["feature_extractor.T.MelSpectrogram.spectrogram.window"] = torch.hann_window(790)
    ckpt = {"state_dict": sd, "epoch": 3, "global_step": 99}
    path = tmp_path / "epoch=3-step=99.ckpt"
    torch.save(ckpt, path)

    loaded = load_torch_checkpoint(str(path))
    assert "time_conv.0.weight" in loaded
    variables = convert_state_dict("voca", loaded)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 29, 16)).astype(np.float32)
    one_hot = np.eye(12, dtype=np.float32)[[0, 5]]
    template = rng.normal(size=(2, 5023, 3)).astype(np.float32)
    mirror.eval()
    with torch.no_grad():
        ref = mirror(torch.as_tensor(x), torch.as_tensor(one_hot), torch.as_tensor(template)).numpy()
    import jax

    ours = np.asarray(
        Voca(15069, 12).apply(
            jax.tree.map(jnp.asarray, variables),
            jnp.asarray(x), jnp.asarray(one_hot), jnp.asarray(template),
        )
    )
    assert np.abs(ours - ref).max() < 1e-4


def test_convert_state_dict_dispatch():
    with pytest.raises(KeyError):
        convert_state_dict("nope", {})


@pytest.mark.parametrize("modelname,mirror_cls", [
    ("audio2mesh", "TorchAudio2Mesh"),
    ("voca", "TorchVoca"),
    ("song2face", "TorchSong2Face"),
])
def test_export_roundtrip(modelname, mirror_cls):
    """torch -> jax (convert) -> torch (export) must be the identity, and the
    exported dict must load into the reference-architecture torch module."""
    import tests.torch_mirrors as mirrors
    from audio2face_tpu.compat.torch_convert import state_dict_to_numpy
    from audio2face_tpu.compat.torch_export import export_state_dict

    torch.manual_seed(42)
    mirror = getattr(mirrors, mirror_cls)(300, 12)
    original = state_dict_to_numpy(mirror)
    variables = convert_state_dict(modelname, original)
    exported = export_state_dict(modelname, variables)

    for k, v in original.items():
        np.testing.assert_allclose(exported[k], v, atol=1e-6, err_msg=k)
    # and it loads back into torch cleanly
    mirror.load_state_dict({k: torch.as_tensor(v) for k, v in exported.items()})


def test_export_faceformer_decoder_roundtrip():
    """Decoder weights survive torch -> jax -> torch (cross q/k are inert
    under the diagonal mask and export as zeros)."""
    from audio2face_tpu.compat.faceformer_convert import convert_faceformer
    from audio2face_tpu.compat.torch_convert import state_dict_to_numpy
    from audio2face_tpu.compat.torch_export import export_faceformer
    from tests.torch_mirrors import TorchFaceFormer

    torch.manual_seed(1)
    mirror = TorchFaceFormer(300, 12)
    original = state_dict_to_numpy(mirror)
    variables = convert_faceformer(original)
    exported = export_faceformer(variables)
    layer = "transformer_decoder.layers.0"
    for k in (
        "audio_feature_map.weight", "vertice_map.weight", "vertice_map_r.bias",
        "obj_vector.weight", f"{layer}.self_attn.in_proj_weight",
        f"{layer}.self_attn.out_proj.bias", f"{layer}.linear1.weight",
        f"{layer}.norm3.weight", f"{layer}.multihead_attn.out_proj.weight",
    ):
        np.testing.assert_allclose(exported[k], original[k], atol=1e-6, err_msg=k)
    # value part of the packed cross projection survives; q/k are zeroed
    np.testing.assert_allclose(
        exported[f"{layer}.multihead_attn.in_proj_weight"][600:],
        original[f"{layer}.multihead_attn.in_proj_weight"][600:], atol=1e-6,
    )
