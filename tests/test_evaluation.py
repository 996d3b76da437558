"""Evaluation metrics (LVE / FDD / MVE / max-L2) vs independent numpy
mirrors, masking semantics, and the geometric region stand-in."""

import numpy as np
import pytest

from audio2face_tpu.evaluation import (
    VertexRegions,
    evaluate_animation,
    infer_regions,
    lip_vertex_error,
    max_vertex_l2,
    mean_vertex_error,
    upper_face_dynamics_deviation,
)

T, V = 7, 40


@pytest.fixture
def anim():
    rng = np.random.default_rng(0)
    template = rng.normal(size=(V, 3)).astype(np.float32)
    gt = template[None] + 0.05 * rng.normal(size=(T, V, 3)).astype(np.float32)
    pred = gt + 0.01 * rng.normal(size=(T, V, 3)).astype(np.float32)
    regions = VertexRegions(lip=np.arange(0, 10), upper=np.arange(25, 40))
    return pred, gt, template, regions


def test_lve_matches_numpy_mirror(anim):
    pred, gt, _, regions = anim
    d2 = np.sum((pred[:, regions.lip] - gt[:, regions.lip]) ** 2, axis=-1)
    expected = np.mean(np.max(d2, axis=1))
    got = float(lip_vertex_error(pred, gt, regions.lip))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_fdd_matches_numpy_mirror(anim):
    pred, gt, template, regions = anim
    ids = regions.upper

    def dyn(z):
        d2 = np.sum((z[:, ids] - template[None, ids]) ** 2, axis=-1)  # (T, Vu)
        return np.std(d2, axis=0)

    expected = np.mean(dyn(pred) - dyn(gt))
    got = float(upper_face_dynamics_deviation(pred, gt, template, ids))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-9)


def test_fdd_sign_convention(anim):
    """An over-animated prediction (amplified motion) has FDD > 0, a frozen
    face (template only) has FDD < 0."""
    _, gt, template, regions = anim
    amplified = template[None] + 2.5 * (gt - template[None])
    frozen = np.broadcast_to(template[None], gt.shape)
    assert float(upper_face_dynamics_deviation(amplified, gt, template, regions.upper)) > 0
    assert float(upper_face_dynamics_deviation(frozen, gt, template, regions.upper)) < 0


def test_mve_and_max_l2(anim):
    pred, gt, _, _ = anim
    d = np.linalg.norm(pred - gt, axis=-1)
    np.testing.assert_allclose(float(mean_vertex_error(pred, gt)), d.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(max_vertex_l2(pred, gt)), d.max(), rtol=1e-6)


def test_frame_mask_ignores_padding(anim):
    """Metrics over a padded batch equal metrics over the valid prefix."""
    pred, gt, template, regions = anim
    pad = np.random.default_rng(1).normal(size=(3, V, 3)).astype(np.float32)
    pred_p = np.concatenate([pred, pad], axis=0)
    gt_p = np.concatenate([gt, np.zeros_like(pad)], axis=0)
    mask = np.concatenate([np.ones(T), np.zeros(3)]).astype(np.float32)

    full = evaluate_animation(pred, gt, template, regions)
    padded = evaluate_animation(pred_p, gt_p, template, regions, frame_mask=mask)
    for k in ("lve", "fdd", "mve", "max_l2"):
        np.testing.assert_allclose(padded[k], full[k], rtol=1e-5, atol=1e-9), k


def test_batched_equals_flat(anim):
    """(B, T, V, 3) with identical items == the single-item scalar."""
    pred, gt, template, regions = anim
    predb = np.stack([pred, pred])
    gtb = np.stack([gt, gt])
    tb = np.stack([template, template])
    flat = evaluate_animation(pred, gt, template, regions)
    batched = evaluate_animation(predb, gtb, tb, regions)
    for k in ("lve", "fdd", "mve", "max_l2"):
        np.testing.assert_allclose(batched[k], flat[k], rtol=1e-5, atol=1e-9)


def test_infer_regions_geometry():
    """On a synthetic head-like point cloud (+y up, +z front), the lip
    region sits low+front+central and the upper region sits high."""
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    regions = infer_regions(pts)
    lo, hi = pts.min(0), pts.max(0)
    u = (pts - lo) / (hi - lo)
    assert np.all(u[regions.lip, 1] < 0.45)
    assert np.all(u[regions.lip, 2] > 0.70)
    assert np.all(u[regions.upper, 1] > 0.60)
    # disjoint by construction on this cloud
    assert not set(regions.lip.tolist()) & set(regions.upper.tolist())


def test_regions_validate():
    with pytest.raises(ValueError):
        VertexRegions(lip=np.array([], np.int32), upper=np.arange(3))


def test_evaluate_animation_infers_regions(anim):
    pred, gt, template, _ = anim
    out = evaluate_animation(pred, gt, template)
    assert set(out) == {"lve", "fdd", "mve", "max_l2"}
    assert all(np.isfinite(v) for v in out.values())


@pytest.mark.slow
def test_experiment_evaluate_sweeps_test_split(tmp_path):
    """Audio2FaceExperiment.evaluate runs the full test split through
    predict and returns finite aggregate metrics (frame-model path)."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.data.synthetic import generate_synthetic_vocaset
    from audio2face_tpu.data.vocaset import VocaDataModule
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    d = str(tmp_path / "voca")
    generate_synthetic_vocaset(d, n_verts=60, sentences_per_subject=1,
                               seconds_per_sentence=0.6)
    cfg = ExpConfig(
        batch_size=16, modelname="audio2mesh", vertex_count=180,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=3e-3,
    )
    dm = VocaDataModule(d, batch_size=cfg.batch_size, split_frame=True)
    dm.setup()
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"))
    state, _ = exp.fit(dm, max_epochs=1)

    out = exp.evaluate(state, dm, max_sentences=2)
    assert out["n_sentences"] >= 1
    for k in ("lve", "fdd", "mve", "max_l2", "err"):
        assert np.isfinite(out[k]), (k, out)
    # self-evaluation sanity: pred vs pred would be 0; vs gt it is small but
    # positive on an untrained-ish model
    assert out["lve"] >= 0 and out["mve"] >= 0
