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
