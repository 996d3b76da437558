import textwrap

from audio2face_tpu.config import ExpConfig

REFERENCE_YAML = textwrap.dedent(
    """
    batch_size: 128
    modelname: "audio2mesh"
    vertex_count: 15069 #5023 * 3
    one_hot_size: 12
    split_frame: True
    percision: "16-mixed"
    lr: 1e-4
    feature_extractor: "mfcc"
    sample_rate: 22000
    n_feature: 32
    out_dim: 52
    win_length: 440 #220*2
    """
)


def test_reference_yaml_roundtrip(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = ExpConfig.from_yaml(str(p))
    assert cfg.batch_size == 128
    assert cfg.modelname == "audio2mesh"
    assert cfg.vertex_count == 15069
    assert cfg.one_hot_size == 12
    assert cfg.split_frame is True
    assert cfg.percision == "16-mixed"
    assert cfg.lr == 1e-4
    assert cfg.feature_extractor == "mfcc"
    assert cfg.sample_rate == 22000
    assert cfg.n_feature == 32
    assert cfg.out_dim == 52
    assert cfg.win_length == 440
    assert cfg.hop_length is None
    assert cfg.loss is None
    # run name format matches the reference (lightning_model.py:46-47)
    assert cfg.name() == "audio2mesh_mfcc_0.0001_None_16-mixed"


def test_precision_alias():
    cfg = ExpConfig(
        batch_size=1, modelname="voca", one_hot_size=12, feature_extractor="mfcc",
        sample_rate=22000, vertex_count=15069, split_frame=True, n_feature=16,
        out_dim=29, win_length=790, precision="32",
    )
    assert cfg.percision == "32"
    assert not cfg.bf16_compute


def test_faceformer_overrides():
    cfg = ExpConfig(
        batch_size=128, modelname="faceformer", one_hot_size=12,
        feature_extractor="mfcc", sample_rate=22000, vertex_count=15069,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
    )
    out = cfg.apply_faceformer_overrides()
    assert out.split_frame is False
    assert out.batch_size == 1
    assert out.feature_extractor is None
    # non-faceformer untouched
    cfg2 = cfg.model_copy(update={"modelname": "voca"})
    assert cfg2.apply_faceformer_overrides().batch_size == 128
