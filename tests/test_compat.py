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


@pytest.mark.slow
def test_export_faceformer_full_roundtrip():
    """FULL-model torch -> jax -> torch round-trip: every original key —
    audio_encoder.* (incl. the weight-norm re-parameterized positional conv)
    and all decoder params — survives, except the cross-attention q/k rows,
    which are inert under the diagonal memory mask and export as zeros.
    The exported dict must also load into the reference-architecture module
    and reproduce its forward."""
    from audio2face_tpu.compat.faceformer_convert import convert_faceformer
    from audio2face_tpu.compat.torch_convert import state_dict_to_numpy
    from audio2face_tpu.compat.torch_export import export_faceformer
    from tests.torch_mirrors import TorchFaceFormer

    d = 64
    torch.manual_seed(1)
    mirror = TorchFaceFormer(300, 12)
    original = state_dict_to_numpy(mirror)
    variables = convert_faceformer(original)
    exported = export_faceformer(variables)

    layer = "transformer_decoder.layers.0"
    cross_in_w = f"{layer}.multihead_attn.in_proj_weight"
    cross_in_b = f"{layer}.multihead_attn.in_proj_bias"
    buffers = {"biased_mask", "ppe"}
    for k, v in original.items():
        if k in buffers:
            continue
        if k in (cross_in_w, cross_in_b):
            # value rows [2d:] survive; q/k rows [:2d] are zeroed (inert)
            np.testing.assert_allclose(exported[k][2 * d :], v[2 * d :], atol=1e-6, err_msg=k)
            np.testing.assert_array_equal(exported[k][: 2 * d], 0.0, err_msg=k)
            continue
        assert k in exported, f"export missing reference key {k}"
        np.testing.assert_allclose(exported[k], v, atol=1e-6, err_msg=k)

    # loads into the reference-architecture module: only the deterministic
    # buffers may be missing
    mirror2 = TorchFaceFormer(300, 12)
    missing, unexpected = mirror2.load_state_dict(
        {k: torch.as_tensor(v) for k, v in exported.items()}, strict=False
    )
    assert set(missing) <= buffers, missing
    assert not unexpected, unexpected

    # forward parity: the re-imported module == the original module
    rng = np.random.default_rng(0)
    audio = torch.as_tensor((rng.normal(size=(1, 4000)) * 0.1).astype(np.float32))
    one_hot = torch.as_tensor(np.eye(12, dtype=np.float32)[[2]])
    template = torch.as_tensor(rng.normal(size=(1, 100, 3)).astype(np.float32))
    mirror.eval(), mirror2.eval()
    with torch.no_grad():
        ref = mirror(audio, one_hot, template).numpy()
        out = mirror2(audio, one_hot, template).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_export_faceformer_from_flax_init():
    """Flax-native faceformer (not torch-originated) exports a state dict
    that loads into the reference architecture and matches the Flax forward
    <1e-4 — the 'train here, serve in the reference' path (VERDICT r1 #4).
    The zero-init vertice maps are randomized first so scale/transpose bugs
    cannot hide behind output == template."""
    import jax
    from audio2face_tpu.compat.torch_export import export_faceformer
    from audio2face_tpu.models.faceformer import FaceFormer
    from tests.torch_mirrors import TorchFaceFormer

    n_verts = 300
    model = FaceFormer(n_verts=n_verts, n_onehot=12, decode_impl="scan")
    rng = np.random.default_rng(3)
    audio_np = (rng.normal(size=(1, 4000)) * 0.1).astype(np.float32)
    one_hot_np = np.eye(12, dtype=np.float32)[[5]]
    template_np = rng.normal(size=(1, 100, 3)).astype(np.float32)
    import jax.numpy as jnp

    audio, one_hot, template = map(jnp.asarray, (audio_np, one_hot_np, template_np))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), audio, one_hot, template)
    params = dict(variables["params"])
    params["vertice_map_kernel"] = jnp.asarray(
        rng.normal(size=params["vertice_map_kernel"].shape).astype(np.float32) * 0.02
    )
    params["vertice_map_r_kernel"] = jnp.asarray(
        rng.normal(size=params["vertice_map_r_kernel"].shape).astype(np.float32) * 0.02
    )
    variables = {"params": params}

    ours = np.asarray(model.apply(variables, audio, one_hot, template))

    exported = export_faceformer(variables)
    mirror = TorchFaceFormer(n_verts, 12)
    missing, unexpected = mirror.load_state_dict(
        {k: torch.as_tensor(v) for k, v in exported.items()}, strict=False
    )
    assert set(missing) <= {"biased_mask", "ppe"}, missing
    assert not unexpected, unexpected
    mirror.eval()
    with torch.no_grad():
        ref = mirror(
            torch.as_tensor(audio_np),
            torch.as_tensor(one_hot_np),
            torch.as_tensor(template_np),
        ).numpy()
    assert np.abs(ours - ref).max() < 1e-4


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """`a2f-export` turns an orbax checkpoint into a Lightning-style .ckpt
    whose tensors convert back (convert_state_dict) to the exact saved
    params + batch_stats — the outbound half of the migration story, driven
    through the CLI."""
    import json
    import os
    import subprocess
    import sys

    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.data.synthetic import generate_synthetic_vocaset
    from audio2face_tpu.data.vocaset import VocaDataModule
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    d = str(tmp_path / "voca")
    generate_synthetic_vocaset(
        d, n_verts=60, sentences_per_subject=1, seconds_per_sentence=0.6
    )
    cfg = ExpConfig(
        batch_size=16, modelname="audio2mesh", vertex_count=180, one_hot_size=12,
        feature_extractor="mfcc", sample_rate=22000, split_frame=True,
        n_feature=32, out_dim=52, win_length=440, percision="32", lr=3e-3,
    )
    dm = VocaDataModule(d, batch_size=cfg.batch_size, split_frame=True)
    dm.setup()

    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    batch = next(dm.train_batches(np.random.default_rng(0)))
    state = exp.init_state(batch)
    ckpt_path = exp.save_checkpoint(state, epoch=0)

    cfg_yaml = tmp_path / "a2m.yaml"
    cfg_yaml.write_text(
        "batch_size: 16\nmodelname: audio2mesh\nvertex_count: 180\n"
        "one_hot_size: 12\nsplit_frame: True\npercision: '32'\nlr: 3e-3\n"
        "feature_extractor: mfcc\nsample_rate: 22000\nn_feature: 32\n"
        "out_dim: 52\nwin_length: 440\n"
    )
    out_ckpt = tmp_path / "exported.ckpt"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["A2F_FORCE_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "audio2face_tpu.cli.export",
         "--config", str(cfg_yaml), "--checkpoint", ckpt_path,
         "--out", str(out_ckpt)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    raw = torch.load(str(out_ckpt), map_location="cpu", weights_only=False)
    assert raw["global_step"] == int(state.step)
    assert all(k.startswith("model.") for k in raw["state_dict"])

    variables = convert_state_dict("audio2mesh", load_torch_checkpoint(str(out_ckpt)))
    import jax

    for got, want in zip(
        jax.tree.leaves(variables["params"]), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
    for got, want in zip(
        jax.tree.leaves(variables["batch_stats"]),
        jax.tree.leaves(state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
