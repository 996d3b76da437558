import jax.numpy as jnp
import numpy as np
import torch

from audio2face_tpu.losses import FaceFormerLoss, VocaLoss, masked_faceformer_loss, mse_error


def torch_voca_loss(pred, gt, k_rec=1.0, k_vel=10.0):
    """Independent torch transcription of the loss formula for cross-checking
    (semantics per reference src/loss/loss.py:25-55)."""
    pred = torch.as_tensor(pred)
    gt = torch.as_tensor(gt)
    bs = pred.shape[0]
    pred = pred.reshape(bs, -1, 3)
    gt = gt.reshape(bs, -1, 3)
    n_verts = pred.shape[1]
    rec = torch.mean(torch.sum((pred - gt) ** 2, dim=2))
    p = pred.reshape(-1, 2, n_verts, 3)
    g = gt.reshape(-1, 2, n_verts, 3)
    vel = torch.mean(torch.sum(((p[:, 1] - p[:, 0]) - (g[:, 1] - g[:, 0])) ** 2, dim=2))
    return rec * k_rec + vel * k_vel, rec, vel


def test_voca_loss_matches_torch_transcription():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(8, 100 * 3)).astype(np.float32)
    gt = rng.normal(size=(8, 100 * 3)).astype(np.float32)
    out = VocaLoss()(jnp.asarray(pred), jnp.asarray(gt))
    t_loss, t_rec, t_vel = torch_voca_loss(pred, gt)
    np.testing.assert_allclose(float(out["rec_loss"]), t_rec.item(), rtol=1e-5)
    np.testing.assert_allclose(float(out["vel_loss"]), t_vel.item(), rtol=1e-5)
    np.testing.assert_allclose(float(out["loss"]), t_loss.item(), rtol=1e-5)


def test_faceformer_loss_drops_odd_frame():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(1, 7, 50, 3)).astype(np.float32)
    gt = rng.normal(size=(1, 7, 50, 3)).astype(np.float32)
    out = FaceFormerLoss()(jnp.asarray(pred), jnp.asarray(gt))
    # equals VocaLoss on first 6 frames treated as the leading axis
    ref = VocaLoss()(jnp.asarray(pred[0, :6]), jnp.asarray(gt[0, :6]))
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]), rtol=1e-6)


def test_masked_loss_matches_unmasked_on_full_batch():
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(1, 6, 50, 3)).astype(np.float32)
    gt = rng.normal(size=(1, 6, 50, 3)).astype(np.float32)
    mask = jnp.ones((1, 6), dtype=jnp.float32)
    out = masked_faceformer_loss(jnp.asarray(pred), jnp.asarray(gt), mask)
    ref = FaceFormerLoss()(jnp.asarray(pred), jnp.asarray(gt))
    for key in ("rec_loss", "vel_loss", "loss"):
        np.testing.assert_allclose(float(out[key]), float(ref[key]), rtol=1e-5)


def test_masked_loss_ignores_padding():
    rng = np.random.default_rng(3)
    pred = rng.normal(size=(1, 4, 50, 3)).astype(np.float32)
    gt = rng.normal(size=(1, 4, 50, 3)).astype(np.float32)
    pred_pad = np.concatenate([pred, rng.normal(size=(1, 3, 50, 3)).astype(np.float32)], axis=1)
    gt_pad = np.concatenate([gt, np.zeros((1, 3, 50, 3), np.float32)], axis=1)
    mask_pad = jnp.asarray(np.concatenate([np.ones((1, 4)), np.zeros((1, 3))], axis=1).astype(np.float32))
    out_pad = masked_faceformer_loss(jnp.asarray(pred_pad), jnp.asarray(gt_pad), mask_pad)
    out = masked_faceformer_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.ones((1, 4)))
    np.testing.assert_allclose(float(out_pad["loss"]), float(out["loss"]), rtol=1e-5)


def test_mse_error_matches_reference_formula():
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(3, 5023, 3)).astype(np.float32)
    gt = rng.normal(size=(3, 5023, 3)).astype(np.float32)
    ours = float(mse_error(jnp.asarray(pred), jnp.asarray(gt)))
    t = torch.mean(
        torch.mean((torch.as_tensor(pred).view(-1, 5023 * 3) - torch.as_tensor(gt).view(-1, 5023 * 3)) ** 2, dim=1)
    ).item()
    np.testing.assert_allclose(ours, t, rtol=1e-5)


import pytest


@pytest.mark.parametrize("t", [50, 51])
def test_chunked_head_loss_matches_unchunked(t):
    """chunked_faceformer_head_loss == masked_faceformer_loss + mse_error on
    the materialized prediction — values AND gradients (the chunked form is
    how padded whole-clip training avoids materializing (B, T, V, 3))."""
    import jax
    import jax.numpy as jnp

    from audio2face_tpu.losses import (
        chunked_faceformer_head_loss,
        masked_faceformer_loss,
        mse_error,
    )

    rng = np.random.default_rng(5)
    b, d, v = 2, 64, 120  # t deliberately NOT a multiple of chunk; 51 hits
    # the odd-trailing-frame path (rec/err only, never a velocity pair)
    hs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    kernel = jnp.asarray((rng.normal(size=(d, v * 3)) * 0.02).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(v * 3,)) * 0.02).astype(np.float32))
    template = jnp.asarray(rng.normal(size=(b, v, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(b, t, v, 3)).astype(np.float32))
    fmask = np.ones((b, t), np.float32)
    fmask[1, 37:] = 0.0  # padded tail
    fmask = jnp.asarray(fmask)

    def unchunked(hs, kernel, bias):
        pred = (jnp.matmul(hs.reshape(-1, d), kernel) + bias).reshape(b, t, -1)
        pred = (pred.astype(jnp.float32) + template.reshape(b, 1, -1)).reshape(b, t, v, 3)
        loss = masked_faceformer_loss(pred, gt, fmask)
        return loss["loss"], (loss, mse_error(pred, gt, v, fmask))

    def chunked(hs, kernel, bias):
        loss, err = chunked_faceformer_head_loss(
            hs, kernel, bias, template, gt, fmask, n_verts=v, chunk=16,
        )
        return loss["loss"], (loss, err)

    (lu, (du, eu)), gu = jax.value_and_grad(unchunked, argnums=(0, 1, 2), has_aux=True)(hs, kernel, bias)
    (lc, (dc, ec)), gc = jax.value_and_grad(chunked, argnums=(0, 1, 2), has_aux=True)(hs, kernel, bias)
    np.testing.assert_allclose(float(lc), float(lu), rtol=1e-6)
    np.testing.assert_allclose(float(ec), float(eu), rtol=1e-6)
    for k in ("rec_loss", "vel_loss"):
        np.testing.assert_allclose(float(dc[k]), float(du[k]), rtol=1e-6)
    for a, bb in zip(gc, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6)
