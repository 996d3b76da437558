"""Checkpoint export: orbax (this framework) -> PyTorch/Lightning ``.ckpt``.

Completes the two-way migration story from the command line. The inbound
direction already has CLI surfaces (``a2f-infer --torch-checkpoint`` serves
reference checkpoints directly; ``Audio2FaceExperiment.load_torch_checkpoint``
fine-tunes from one); this is the outbound one: models trained here load
back into the reference's PyTorch modules
(src/model/audio2face.py / voca.py / song2face.py / faceformer.py), byte
format and key names included::

    a2f-export --config configs/voca.yaml --out voca.ckpt
    a2f-export --config configs/faceformer.yaml \
               --checkpoint logs/.../checkpoints/epoch=7-step=123 --out ff.ckpt

The output is a Lightning-style dict (``{"state_dict": {"model.<key>": ...},
"epoch", "global_step"}``) so the reference's
``Audio2FaceModel.load_from_checkpoint``-era tooling and plain
``torch.load(...)["state_dict"]`` both work. Feature-extractor buffers
(torchaudio MFCC filterbanks) are deterministic constants the reference's
constructor rebuilds, so they are not stored — load with ``strict=False``
into a full LightningModule, or strictly into the bare model after stripping
the ``model.`` prefix (``compat.torch_convert.load_torch_checkpoint`` shows
the inverse).
"""

import argparse
import os

import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # pins A2F_FORCE_PLATFORM before first JAX use


def _newest_checkpoint(log_dir: str) -> str:
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        raise SystemExit(f"no checkpoints/ under {log_dir}; pass --checkpoint")
    names = sorted(os.listdir(ckpt_dir), key=lambda x: int(x.split("=")[-1]))
    if not names:
        raise SystemExit(f"{ckpt_dir} is empty; pass --checkpoint")
    return os.path.join(ckpt_dir, names[-1])


def main() -> None:
    parser = argparse.ArgumentParser(
        description="export an orbax checkpoint as a reference-loadable "
        "PyTorch/Lightning .ckpt"
    )
    parser.add_argument("--config", required=True, help="experiment YAML "
                        "(determines the model family and the default log dir)")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir (default: newest under "
                             "logs/<config name>/checkpoints)")
    parser.add_argument("--out", required=True, help="output .ckpt path")
    args = parser.parse_args()

    import orbax.checkpoint as ocp
    import torch

    from audio2face_tpu.compat.torch_export import export_state_dict
    from audio2face_tpu.config import ExpConfig

    config = ExpConfig.from_yaml(args.config).apply_faceformer_overrides()
    path = args.checkpoint or _newest_checkpoint(
        os.path.join("logs", config.name())
    )
    restored = ocp.PyTreeCheckpointer().restore(path)

    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    sd = export_state_dict(config.modelname, variables)

    ckpt = {
        "state_dict": {
            f"model.{k}": torch.as_tensor(np.asarray(v)) for k, v in sd.items()
        },
        "epoch": int(restored.get("epoch", 0)),
        "global_step": int(np.asarray(restored["step"])),
    }
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    torch.save(ckpt, args.out)
    n_params = sum(int(np.asarray(v).size) for v in sd.values())
    print(
        f"exported {config.modelname} step {ckpt['global_step']} "
        f"({len(sd)} tensors, {n_params:,} scalars) from {path} -> {args.out}"
    )


if __name__ == "__main__":
    main()
