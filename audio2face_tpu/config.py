"""Experiment configuration.

Mirrors the reference's pydantic ``ExpConfig`` schema and ``config.yaml`` keys
(reference: src/model/lightning_model.py:20-47, config.yaml:1-12), including
the historical ``percision`` spelling which remains the canonical YAML key.
A ``precision`` alias is additionally accepted.
"""

from __future__ import annotations

from typing import Optional

import yaml
from pydantic import BaseModel, model_validator


class ExpConfig(BaseModel):
    """Full experiment schema, loadable from a YAML file.

    The key set and semantics match the reference config
    (src/model/lightning_model.py:20-44):

    - dataset: ``batch_size``
    - model: ``modelname``, ``one_hot_size``, ``feature_extractor``,
      ``sample_rate``, ``vertex_count``, ``split_frame``, ``n_feature``,
      ``out_dim``, ``win_length``, ``hop_length``
    - training: ``percision`` (sic), ``lr``
    - loss: ``loss``
    """

    # dataset
    batch_size: int
    # model
    modelname: str
    one_hot_size: int
    feature_extractor: Optional[str]
    sample_rate: int
    vertex_count: int
    split_frame: bool
    n_feature: int
    out_dim: int
    win_length: int
    hop_length: Optional[int] = None
    # training
    percision: str = "16-mixed"
    lr: float = 1e-4
    # loss
    loss: Optional[str] = None
    # ---- TPU-native extensions (absent keys default to reference behavior) ----
    # random seed for params/dropout
    seed: int = 0
    # maximum decoded sequence length (frames) for faceformer-style models;
    # the reference hard-caps at 600 (src/model/faceformer.py:119) — we default
    # to 3600 (60 s @ 60 fps) since the KV-cached scan decode is O(T).
    max_seq_len: int = 3600
    # device mesh axes for pjit: (data, model). -1 = all remaining devices.
    mesh_shape: tuple[int, int] = (-1, 1)
    # training schedule (reference: train.py:48-59)
    max_epochs: int = 50
    early_stop_patience: int = 5
    # gradient accumulation: split each batch into k in-jit microbatches,
    # average their grads, apply ONE optimizer update (Lightning's
    # accumulate_grad_batches semantics; batch_size must divide by k)
    accumulate_grad_batches: int = 1
    # FSDP / ZeRO-3: shard params + Adam moments over the mesh's data axis
    # (GSPMD all-gathers weights at use, reduce-scatters grads); composes
    # with tensor parallelism. See parallel/fsdp.py.
    fsdp: bool = False
    # dataset family: "vocaset" (reference main path) or "biwi" (the
    # reference's dead-but-present alignment mode, implemented for real:
    # FaceFormer runs 25 fps frames with 2-way cross attention and live
    # cross q/k params; pair with data/biwi.py's BiwiDataModule)
    dataset: str = "vocaset"

    @model_validator(mode="before")
    @classmethod
    def _accept_precision_alias(cls, values):
        if isinstance(values, dict) and "precision" in values and "percision" not in values:
            values = dict(values)
            values["percision"] = values.pop("precision")
        return values

    @classmethod
    def from_yaml(cls, path: str) -> "ExpConfig":
        with open(path, "r") as f:
            config = yaml.safe_load(f)
        return cls(**config)

    def name(self) -> str:
        """Run/version name, identical format to the reference
        (src/model/lightning_model.py:46-47)."""
        return f"{self.modelname}_{self.feature_extractor}_{self.lr}_{self.loss}_{self.percision}"

    @property
    def n_verts(self) -> int:
        return self.vertex_count

    @property
    def bf16_compute(self) -> bool:
        """True when the reference-style AMP string requests reduced precision.

        The reference trains with Lightning ``precision="16-mixed"``
        (train.py:48-50); on TPU the equivalent policy is bfloat16 compute
        with float32 parameters and optimizer state.
        """
        p = self.percision.lower()
        return "16" in p or "bf16" in p

    def apply_faceformer_overrides(self) -> "ExpConfig":
        """The reference special-cases faceformer in train.py:30-34:
        whole-sentence items, batch size 1, no standalone feature extractor."""
        if self.modelname == "faceformer":
            return self.model_copy(
                update={"split_frame": False, "batch_size": 1, "feature_extractor": None}
            )
        return self
